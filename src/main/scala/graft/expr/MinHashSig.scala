package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression.
  *
  * The higher-order-function formulation (`transform(sequence(...),
  * i -> array_min(transform(...)))`) is evaluated interpreted, one
  * boxed lambda call per (gram × hash function) — ~80M boxed ops for
  * 5k mid-sized docs (measured ~15s). This expression calls one tight
  * JVM kernel per row ([[Kernels.minhashSig]]): xxhash64 over each
  * byte k-gram (seed 42, byte-identical to `xxhash64(substring(s,i,k))`
  * for ASCII) with Kirsch-Mitzenmacher double hashing across the
  * numHashes functions. `doGenCode` emits a direct kernel call, so the
  * surrounding projection keeps its whole-stage-codegen span.
  *
  * Scale note: this is the engine's hot scan kernel for corpus dedup —
  * narrow, no shuffle, per-row cost independent of corpus size.
  */
final case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val mins = Kernels.minhashSig(input.asInstanceOf[UTF8String], k, numHashes)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = graft.expr.Kernels.minhashSig($input, $k, $numHashes);
         |if ($mins == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Column-API entry points for graft's native expressions. */
object Exprs {
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(text), k, numHashes))
}
