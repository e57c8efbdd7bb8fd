package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native typed-imperative aggregate. The buffer is a depth × width
  * counter matrix; merge is element-wise addition, so partials combine
  * map-side and the shuffle carries depth·width longs per group
  * regardless of input size.
  *
  * The OUTPUT is the sketch itself (array<long>, row-major): store it
  * per group/day/partition, merge stored sketches with element-wise
  * array addition, and answer point-frequency queries later — without
  * the raw data — via [[CountMin.cmsQuery]], which is built purely
  * from codegen'd built-ins (element_at/xxhash64/least) because the
  * update path hashes EXACTLY like SQL `xxhash64(item, row)`.
  * Estimates are upper bounds: true_count <= est <= true_count +
  * eps·N with eps = e/width at the usual confidence given depth rows.
  */
final case class CountMin(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0 && depth * width <= (1 << 22),
    s"count-min $depth x $width too large")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  /** Mirrors SQL xxhash64(value, rowSeed): fold-left over the args
    * with seed 42 — the query side reuses the SQL function directly. */
  private def cellOf(v: Any, row: Int): Int = {
    val h1 = v match {
      case s: UTF8String =>
        val b = s.getBytes
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      case l: Long => XXH64.hashLong(l, 42L)
      case i: Int => XXH64.hashInt(i, 42L)
      case other => XXH64.hashLong(other.hashCode().toLong, 42L)
    }
    val h = XXH64.hashInt(row, h1)
    (((h % width) + width) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < depth) { buf(r * width + cellOf(v, r)) += 1; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren.head)
}

object CountMin {
  /** Aggregate `c` into a count-min sketch (array<long>, row-major). */
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 1024): Column =
    GraftColumnBridge.column(
      CountMin(GraftColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Point-frequency estimate of `item` from a stored sketch column —
    * pure built-ins (stays in whole-stage codegen), hash-compatible
    * with the aggregate's update path by construction. */
  def cmsQuery(sketch: Column, item: Column, depth: Int = 4, width: Int = 1024): Column =
    (0 until depth).map { r =>
      element_at(sketch,
        (pmod(xxhash64(item, lit(r)), lit(width.toLong)) + lit(r.toLong * width) + 1).cast("int"))
    }.reduce(least(_, _))

  /** Merge stored sketches (e.g. one per day) into one: element-wise
    * array addition, again pure built-ins. */
  def cmsMerge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)
}
