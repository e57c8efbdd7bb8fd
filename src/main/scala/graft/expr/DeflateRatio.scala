package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string's UTF-8 bytes:
  * `compressed_len / raw_len` (1.0 for the empty string). The
  * compression-based quality signal crawl pipelines use alongside the
  * Gopher rules: templated/boilerplate/repetitive documents compress
  * far below prose (ratio ≲ 0.3), random or already-compressed junk
  * sits near or above 1.0 — a single number that catches repetition
  * the n-gram fractions miss (long-range, structural).
  *
  * One fused kernel call per row ([[Kernels.deflateRatio]]) with a
  * thread-local `Deflater` (native zlib state is reused via
  * `reset()`, never allocated per row — allocation would dominate at
  * scan rates). No SQL-replayable oracle exists (zlib is not
  * expressible in SQL), so correctness is pinned by ScalaTest
  * invariants: monotone under repetition, exact on known streams,
  * stable across calls.
  */
final case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(s: Any): Any =
    Kernels.deflateRatio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.Kernels.deflateRatio($s);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  def deflateRatio(text: Column): Column =
    GraftColumnBridge.column(DeflateRatio(GraftColumnBridge.expression(text)))
}
