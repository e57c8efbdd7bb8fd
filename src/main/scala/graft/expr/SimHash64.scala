package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar, STOC 2002) as a native expression: bit j
  * of the output is set iff the sum over whitespace tokens of ±1
  * (sign of bit j of the token's xxhash64) is positive.
  *
  * One pass over the input bytes: tokens are delimited inline (no
  * split allocation), each token hashed once, 64 bit-counters updated
  * in a local array. Byte-identical to hashing the results of
  * `split(trim(lower(s)), "\s+")` for ASCII whitespace-separated text
  * (caller lower-cases; multi-space runs and edges yield empty tokens
  * which are skipped, matching the HOF formulation's filter).
  */
final case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val sums = new Array[Int](64)
    var start = 0
    var i = 0
    var sawToken = false
    while (i <= n) {
      val isSep = i == n || bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r' || bytes(i) == '\f' ||
        bytes(i) == 0x0b // vertical tab — \s in Java regex
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
    if (!sawToken) null
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (sums(j) > 0) out |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))
}
