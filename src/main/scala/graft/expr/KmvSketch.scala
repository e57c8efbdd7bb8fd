package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** KMV (bottom-k minimum values) distinct-count sketch as a native
  * typed-imperative aggregate.
  *
  * Keeps the k smallest distinct 64-bit hashes seen; the estimate is
  * (k-1) / kthMinFraction (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002). Mergeable (union of
  * bottom-k sets), so it partial-aggregates map-side like any native
  * Spark aggregate — the shuffle carries at most k longs per group
  * regardless of input size, exactly what a 100 TB dedup-cardinality
  * estimate needs. Spark's own approx_count_distinct (HLL++) is the
  * default choice; KMV additionally supports set-intersection
  * estimates downstream and demonstrates the
  * TypedImperativeAggregate extension surface.
  */
final case class KmvSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def hashOf(v: Any): Long = v match {
    case s: UTF8String =>
      val b = s.getBytes
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    case d: Double => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case other => XXH64.hashLong(other.hashCode().toLong, 42L)
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, hashOf(v))
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // store hashes flipped to unsigned order via xor with MinValue so
    // TreeSet's signed ordering matches unsigned hash order
    val key = java.lang.Long.valueOf(h ^ Long.MinValue)
    if (buf.size < k) { buf.add(key); () }
    else if (key.longValue < buf.last.longValue && !buf.contains(key)) {
      buf.add(key); buf.remove(buf.last); ()
    }
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (a.size < k) { a.add(key); () }
      else if (key.longValue < a.last.longValue && !a.contains(key)) {
        a.add(key); a.remove(a.last); ()
      }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // estimate = (k-1) / fraction-of-hash-space below the k-th min.
      // Stored keys are unsigned-order-flipped; unflip: u = f + 2^63.
      val u = buf.last.longValue.toDouble + 9.223372036854776e18
      val frac = u / 1.8446744073709552e19
      if (frac <= 0) buf.size.toLong else math.round((k - 1) / frac)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(java.lang.Long.valueOf(bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Approximate distinct count of `c` with a bottom-`k` sketch. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    GraftColumnBridge.column(
      KmvSketch(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
