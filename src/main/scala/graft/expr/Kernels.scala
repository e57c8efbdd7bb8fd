package graft.expr

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted eval paths and the
  * generated code of [[MinHashSig]] / [[SimHash64]] (Scala objects
  * emit static forwarders, so generated Java can call
  * `graft.expr.Kernels.minhashSig(...)` directly). */
object Kernels {

  /** MinHash signature via K-M double hashing; null iff no k-gram. */
  def minhashSig(input: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val bytes = input.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
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
    mins
  }

  /** 64-bit SimHash over ASCII-whitespace tokens; MIN_VALUE sentinel
    * (never a real simhash of interest) signals "no tokens" so the
    * generated code can branch to null without boxing. */
  val NoTokens: Long = Long.MinValue

  def simhash64(input: UTF8String): Long = {
    val bytes = input.getBytes
    val n = bytes.length
    val sums = new Array[Int](64)
    var start = 0
    var i = 0
    var sawToken = false
    while (i <= n) {
      val isSep = i == n || bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r' || bytes(i) == '\f' ||
        bytes(i) == 0x0b
      if (isSep) {
        if (i > start) {
          sawToken = true
          val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!sawToken) NoTokens
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (sums(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }
}
