package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Element-wise sum of an `array<float>` column plus the contributing
  * row count, as one mergeable typed-imperative aggregate.
  *
  * This is the shuffle-shape fix for distributed centroid updates
  * (k-means): the naive per-position mean — `posexplode` then
  * `groupBy(cell, pos)` — shuffles |corpus|·dim scalar rows per
  * iteration. Here partials combine map-side, so the shuffle carries
  * ONE (dim doubles + count) buffer per group per map task, independent
  * of corpus size; the mean is derived afterwards with codegen'd
  * built-ins (`transform(sums, x -> x / n)`).
  *
  * Sums accumulate in double (float inputs upcast per element) —
  * matching what `avg(float)` would produce per position. All input
  * vectors in a group must share one length; a mismatch fails loudly
  * rather than silently truncating.
  */
final case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType)))
  override def prettyName: String = "vector_sum"

  override def createAggregationBuffer(): VectorSum.Buf =
    new VectorSum.Buf(Array.emptyDoubleArray, 0L)

  override def update(buf: VectorSum.Buf, input: InternalRow): VectorSum.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (buf.n == 0L && buf.sums.isEmpty) buf.sums = new Array[Double](dim)
    else require(buf.sums.length == dim,
      s"vector_sum: mixed vector lengths ${buf.sums.length} vs $dim in one group")
    var i = 0
    while (i < dim) { buf.sums(i) += arr.getFloat(i).toDouble; i += 1 }
    buf.n += 1L
    buf
  }

  override def merge(a: VectorSum.Buf, b: VectorSum.Buf): VectorSum.Buf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    require(a.sums.length == b.sums.length,
      s"vector_sum: mixed vector lengths ${a.sums.length} vs ${b.sums.length} in one group")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  override def eval(buf: VectorSum.Buf): Any =
    if (buf.n == 0L) null
    else new GenericInternalRow(Array[Any](new GenericArrayData(buf.sums), buf.n))

  override def serialize(buf: VectorSum.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + buf.sums.length * 8)
    bb.putLong(buf.n).putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sums = Array.fill(bb.getInt)(bb.getDouble)
    new VectorSum.Buf(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren.head)
}

object VectorSum {
  /** Mutable aggregation state: element sums + contributing row count. */
  final class Buf(var sums: Array[Double], var n: Long)

  /** Aggregate an `array<float>` column into `struct(sums array<double>,
    * n long)`; derive the mean with `transform(s.sums, x -> x / s.n)`. */
  def vectorSum(c: Column): Column =
    GraftColumnBridge.column(
      VectorSum(GraftColumnBridge.expression(c)).toAggregateExpression())
}
