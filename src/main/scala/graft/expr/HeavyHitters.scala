package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native typed-imperative
  * aggregate: one pass, at most `k` counters per partial, mergeable
  * (Agarwal et al., "Mergeable Summaries", PODS 2012 — merge = add
  * counters, then subtract the (k+1)-th largest and drop non-positive).
  *
  * Guarantees after any merge tree: every item with true frequency
  * > n/(k+1) is present, and each reported count is a lower bound
  * within n/(k+1) of the truth. That is exactly the "top tokens over
  * 100 TB without a per-token shuffle" shape — the shuffle carries at
  * most k (item, count) pairs per group instead of the full token
  * domain (contrast q_vocab_top, which pays the full groupBy and is
  * exact). Counter values depend on merge order, so results are
  * guarantee-deterministic, not bit-deterministic — ScalaTest coverage,
  * no SQL oracle.
  */
final case class HeavyHitters(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count_lo", LongType))))
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** MG reduce step: if over k counters, subtract the (k+1)-th largest
    * count from all and drop non-positive entries. */
  private def shrink(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size <= k) return
    val counts = new Array[Long](buf.size)
    var i = 0
    val it = buf.values().iterator()
    while (it.hasNext) { counts(i) = it.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val cut = counts(buf.size - k - 1) // (k+1)-th largest
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
    }
  }

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.merge(s, 1L, (a, b) => a + b)
      shrink(buf)
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    shrink(a)
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Misra-Gries top-`k` summary of `c`: array<struct<item, count_lo>>
    * sorted by descending lower-bound count. */
  def mgTopK(c: Column, k: Int = 64): Column =
    GraftColumnBridge.column(
      HeavyHitters(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
