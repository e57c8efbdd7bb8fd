package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF cell assignment `argmax_cell(vec, cents)` as one native fused
  * expression — the build-side hot kernel of every IVF index pass
  * ([[graft.ops.Ann.ivfTopK]], k-means assignment, streaming ANN
  * ingest). Semantics are bit-identical to the composed
  * `array_max(transform(cents, (c,i) -> struct(round(cosine,6), -i,
  * cent_id)))` form ([[graft.ops.Ann.bestCellHof]], the executable
  * spec it is property-tested against), with ONE deliberate
  * divergence: a null `vec` yields a null cell (the composed form
  * assigned null vectors to the first centroid — an artifact of
  * null-first struct ordering, not a choice).
  *
  * Why native: `transform`'s lambda evaluates interpreted per
  * centroid — at 256 cells × 64 dims that is 256 boxed lambda
  * dispatches + struct allocations per corpus row, and the vector's
  * norm is re-accumulated inside every cosine. One loop with no
  * allocation keeps the assignment scan inside whole-stage codegen
  * (measured 59 s → ~25 s for a 2 M × 256-cell index build). */
final case class ArgmaxCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<struct<cent_id: bigint, " +
      s"cent_vec: array<float>>>), got (${left.dataType.simpleString}, " +
      s"${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_cell"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    Kernels.argmaxCosineCell(vec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Long $r = graft.expr.Kernels.argmaxCosineCell($vec, $cents);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArgmaxCell =
    copy(left = newLeft, right = newRight)
}

object ArgmaxCell {
  def argmaxCell(vec: Column, cents: Column): Column =
    GraftColumnBridge.column(ArgmaxCell(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents)))
}
