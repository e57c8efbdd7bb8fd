package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Winnowing window-min selection as a native O(n) expression: input
  * array<bigint> of gram hashes, output array<struct<pos, fp>> of the
  * selected fingerprints (1-based positions, rightmost-min ties,
  * deduplicated by consecutive position).
  *
  * The higher-order-function formulation ([[graft.text.Winnowing]]'s
  * executable spec) builds a w-slice per window and scans it three
  * times (min, reverse, position) through boxed lambdas — O(n·w) with
  * an allocation per window, ~8 ms per ordinary document interpreted.
  * This kernel is the textbook monotone-deque sliding minimum: each
  * index enters and leaves the deque once — O(n), zero boxing.
  * Popping on `>=` keeps the RIGHTMOST of equal minima at the front,
  * matching the spec's reverse/array_position tie-break exactly. */
final case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window $w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"

  override protected def nullSafeEval(h: Any): Any =
    Kernels.winnowSelect(
      h.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.expr.Kernels.winnowSelect($h, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  def winnowSelect(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowSelect(GraftColumnBridge.expression(hashes), w))
}
