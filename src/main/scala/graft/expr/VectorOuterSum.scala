package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** One-pass second-moment statistics of an `array<float>` column:
  * element sums, flattened outer-product sums (row-major dim×dim), and
  * the row count — everything a covariance/Gram matrix needs, in one
  * mergeable typed-imperative aggregate.
  *
  * The composed alternative — `flatten(transform(v, x -> transform(v,
  * y -> x*y)))` into [[VectorSum]] — materializes a dim² array per ROW
  * through interpreted lambda dispatch (4096 boxed ops per row at dim
  * 64). Here the dim² multiply-adds run in one tight primitive loop
  * per row and only the per-task partial (dim² doubles + dim doubles +
  * count ≈ 33 KB at dim 64) ever crosses the shuffle — covariance at
  * scan speed, the same shuffle-shape argument as [[VectorSum]].
  *
  * Reference scope: covariance/PCA whitening for the embedding-ops
  * family (graft.ops.Pca); cf. Su et al. 2021 "Whitening Sentence
  * Representations" for the training-data use. */
final case class VectorOuterSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorOuterSum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("outer", ArrayType(DoubleType, containsNull = false)),
    StructField("n", LongType)))
  override def prettyName: String = "vector_outer_sum"

  override def createAggregationBuffer(): VectorOuterSum.Buf =
    new VectorOuterSum.Buf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

  override def update(buf: VectorOuterSum.Buf, input: InternalRow): VectorOuterSum.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (buf.n == 0L && buf.sums.isEmpty) {
      buf.sums = new Array[Double](dim)
      buf.outer = new Array[Double](dim * dim)
    } else require(buf.sums.length == dim,
      s"vector_outer_sum: mixed vector lengths ${buf.sums.length} vs $dim in one group")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = arr.getFloat(i).toDouble; buf.sums(i) += x(i); i += 1 }
    i = 0
    while (i < dim) {
      val xi = x(i); val base = i * dim
      var j = 0
      while (j < dim) { buf.outer(base + j) += xi * x(j); j += 1 }
      i += 1
    }
    buf.n += 1L
    buf
  }

  override def merge(a: VectorOuterSum.Buf, b: VectorOuterSum.Buf): VectorOuterSum.Buf = {
    if (b.n == 0L) return a
    if (a.n == 0L) return b
    require(a.sums.length == b.sums.length,
      s"vector_outer_sum: mixed vector lengths ${a.sums.length} vs ${b.sums.length}")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < a.outer.length) { a.outer(i) += b.outer(i); i += 1 }
    a.n += b.n
    a
  }

  override def eval(buf: VectorOuterSum.Buf): Any =
    if (buf.n == 0L) null
    else new GenericInternalRow(Array[Any](
      new GenericArrayData(buf.sums), new GenericArrayData(buf.outer), buf.n))

  override def serialize(buf: VectorOuterSum.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 4 + buf.sums.length * 8 + buf.outer.length * 8)
    bb.putLong(buf.n).putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    buf.outer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorOuterSum.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val dim = bb.getInt
    val sums = Array.fill(dim)(bb.getDouble)
    val outer = Array.fill(dim * dim)(bb.getDouble)
    new VectorOuterSum.Buf(sums, outer, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorOuterSum =
    copy(child = newChildren.head)
}

object VectorOuterSum {
  /** Mutable state: element sums, row-major outer-product sums, count. */
  final class Buf(var sums: Array[Double], var outer: Array[Double], var n: Long)

  /** Aggregate an `array<float>` column into
    * `struct(sums array<double>, outer array<double>, n long)`. */
  def vectorOuterSum(c: Column): Column =
    GraftColumnBridge.column(
      VectorOuterSum(GraftColumnBridge.expression(c)).toAggregateExpression())
}
