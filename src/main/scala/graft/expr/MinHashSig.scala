package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression.
  *
  * The higher-order-function formulation (`transform(sequence(...),
  * i -> array_min(transform(...)))`) is evaluated interpreted, one
  * boxed lambda call per (gram × hash function) — ~80M boxed ops for
  * 5k mid-sized docs (measured ~15s). This expression runs the same
  * arithmetic as one tight JVM loop per row: xxhash64 over each byte
  * k-gram (seed 42, byte-identical to `xxhash64(substring(s,i,k))` for
  * ASCII), then `numHashes` linear mixes of two 30-bit halves with a
  * running min. No allocation beyond the output array.
  *
  * Scale note: this is the engine's hot scan kernel for corpus dedup —
  * narrow, no shuffle, and the per-row cost is independent of corpus
  * size, so it is exactly the thing a 1000-executor cluster
  * parallelizes perfectly.
  */
final case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // Kirsch-Mitzenmacher double hashing: h_j = h1 + j·h2 gives
      // near-independent hash functions from two base hashes (h2 made
      // odd ⇒ bijective step mod 2^64). A single-base linear mix is
      // NOT enough: its argmin gram barely varies with j, so signature
      // positions agree together and est_jaccard inflates badly
      // (observed 41k vs ~100 true near-dup pairs on 500 docs).
      val h1 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      val h2 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 1337L) | 1L
      var j = 0
      var m = h1
      while (j < numHashes) {
        if (m < mins(j)) mins(j) = m
        m += h2 // wraps mod 2^64 — intentional
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Column-API entry points for graft's native expressions. */
object Exprs {
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(text), k, numHashes))
}
