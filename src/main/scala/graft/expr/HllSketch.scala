package graft.expr

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native typed-imperative
  * aggregate (Flajolet et al., "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm", AofA 2007) —
  * the fixed-size sibling of [[KmvSketch]]: a KMV buffer is k longs
  * and supports intersections; HLL is 2^p BYTES total with ~1.04/√m
  * relative error, which is what you reserve per group when a single
  * pass must carry MILLIONS of group sketches (per-domain distinct
  * users over a crawl). Spark's own approx_count_distinct is HLL++;
  * this one exists so the engine owns the register layout — the
  * registers are exposed ([[HllSketch.registersMd5]]) and the merge
  * is plain per-register max, so sketches can be persisted as 2^p-byte
  * binaries and unioned across days in SQL.
  *
  * Buffer: m = 2^p byte registers, M[j] = max over hashes landing in
  * bucket j (top p bits) of (leading zeros of the remaining 64-p bits)
  * + 1. All integer arithmetic until the one final estimate division.
  * Mergeable by per-register max — partial-aggregates map-side; the
  * shuffle carries m bytes per group regardless of input size.
  * Estimate: alpha_m * m^2 / sum(2^-M[j]), with the standard
  * small-range linear-counting correction (E <= 2.5m and empty
  * registers present -> m * ln(m/V)); the 64-bit-hash large-range
  * correction is unnecessary (collision term < 1e-9 at any realistic
  * cardinality).
  */
final case class HllSketch(
    child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll precision p must be in [4,16]: $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def hashOf(v: Any): Long = v match {
    case s: UTF8String =>
      val b = s.getBytes
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case other => XXH64.hashLong(other.hashCode().toLong, 42L)
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashOf(v)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      // rho = position of the first 1-bit in the remaining 64-p bits;
      // all-zero remainder gets the max value 64-p+1
      val rho = if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = HllSketch.estimate(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {

  /** Approximate distinct count of `c` with 2^p byte registers
    * (p=12 -> 4 KB, ~1.6% typical error). */
  def hllDistinct(c: Column, p: Int = 12): Column =
    GraftColumnBridge.column(
      HllSketch(GraftColumnBridge.expression(c), p).toAggregateExpression())

  /** The estimate for a register array — exposed so persisted 2^p-byte
    * sketches can be unioned (per-register max) and re-estimated
    * without re-scanning. */
  def estimate(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -regs(i)) // exact powers of two
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  /** Replayable register construction: the same bucket/rho layout over
    * a 60-bit md5-derived hash (15 hex chars — positive in any signed
    * engine, so the bit arithmetic needs no unsigned types anywhere).
    * Output: one row per occupied bucket, (bucket, rho = max). An
    * external engine re-derives this frame exactly — the DuckDB oracle
    * does — which pins the DISTRIBUTED half of the sketch (hashing,
    * bucketing, per-bucket max) in cross-engine integer arithmetic;
    * the float estimate is [[estimate]], pinned driver-side in spec.
    * rho via length(bin(w)) — integer msb, immune to the
    * floor(log2(2^k-1)) float round-up that off-by-ones a log-based
    * formulation. */
  def registersMd5(df: DataFrame, valueCol: String, p: Int = 12,
                   salt: Long = 0L): DataFrame = {
    require(p >= 4 && p <= 16, s"hll precision p must be in [4,16]: $p")
    val wBits = 60 - p
    val h = conv(substring(md5(concat_ws(":", col(valueCol), lit(salt))), 1, 15),
      16, 10).cast("long")
    val w = h.bitwiseAND(lit((1L << wBits) - 1))
    val rho = when(w === 0, wBits + 1)
      .otherwise(lit(wBits + 1) - length(bin(w)))
    df.where(col(valueCol).isNotNull)
      .select(shiftright(h, wBits).bitwiseAND(lit((1 << p) - 1)).as("bucket"),
        rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))
  }
}
