package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** MinHash estimated Jaccard — the fraction of agreeing positions in
  * two `array<long>` signatures — as a native expression. The
  * composed `size(filter(zip_with(...)))` form evaluates interpreted
  * per candidate pair; candidate scoring is the post-banding hot loop
  * of LSH dedup, so this keeps it codegen'd ([[Kernels.sigAgreement]]).
  * Identical output on equal-length signatures (the only shape the
  * dedup pipeline produces); deliberately STRICTER on length mismatch
  * — null, where the composed form's zip_with null-padding would count
  * padded positions as disagreements. */
final case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("agree")
      s"""
         |java.lang.Double $r = graft.expr.Kernels.sigAgreement($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def sigAgreement(a: Column, b: Column): Column =
    GraftColumnBridge.column(SigAgreement(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
