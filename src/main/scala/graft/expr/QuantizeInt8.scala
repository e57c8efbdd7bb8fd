package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization of an `array<float>`
  * embedding: `struct(scale double, q array<int>)` with
  * scale = max(|v|)/127 and q_i = floor(v_i/scale + 0.5), q_i in
  * [-127, 127]. The storage-efficiency pass of an embedding pipeline —
  * 4x smaller vectors at a bounded dequantization error (|v_i -
  * q_i*scale| <= scale/2), dequantized with codegen'd built-ins
  * (`transform(q, x -> x * scale)`).
  *
  * One fused O(dim) loop per row ([[Kernels.quantizeInt8]]). The
  * declarative `transform(vec, x -> x / (array_max(...)/127))`
  * formulation is O(dim²) per row after CollapseProject inlines the
  * array-max into the per-element lambda. Half-up rounding is spelled
  * floor(x + 0.5), so any engine replaying the same doubles produces
  * identical integers (no banker's-rounding divergence) — this is what
  * makes the DuckDB oracle replay exact. */
final case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override protected def nullSafeEval(v: Any): Any =
    Kernels.quantizeInt8(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.Kernels.quantizeInt8($v);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def quantizeInt8(vec: Column): Column =
    GraftColumnBridge.column(QuantizeInt8(GraftColumnBridge.expression(vec)))

  /** Dequantize back to approximate floats — pure built-ins, stays in
    * whole-stage codegen. */
  def dequantize(q: Column, scale: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(q, x => (x.cast("double") * scale).cast("float"))
  }
}
