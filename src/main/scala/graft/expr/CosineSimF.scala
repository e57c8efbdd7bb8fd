package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity between two `array<float>` columns as a native
  * expression.
  *
  * The composable form (`aggregate(zip_with(a, b, (p,q) -> ...)))`)
  * evaluates interpreted — one boxed lambda invocation per element per
  * pass, three passes per row (dot + two norms). This expression runs
  * one fused loop ([[Kernels.cosineF]]) accumulating all three sums,
  * producing a bit-identical double (same sequential IEEE op order per
  * accumulator), and `doGenCode` keeps the surrounding projection in
  * its whole-stage-codegen span. It is the hot kernel of every ANN
  * operator in [[graft.ops.Ann]] — at corpus × query scale the scan is
  * all multiply-adds, so interpreted lambdas are the difference
  * between scan-speed and 10× slower. */
final case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression {

  // explicit type check: a mistyped call (e.g. a bare array<double>
  // literal from SQL) must be an analysis error, not garbage floats
  // silently read through ArrayData.getFloat
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cos")
      s"""
         |java.lang.Double $r = graft.expr.Kernels.cosineF($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimF =
    copy(left = newLeft, right = newRight)
}

object CosineSimF {
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimF(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
