package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** KLL streaming quantile sketch (Karnin, Lang, Liberty: "Optimal
  * quantile approximation in streams", FOCS 2016) as a mergeable
  * native aggregate.
  *
  * State is a pyramid of levels; an item at level i carries weight
  * 2^i. When a level overflows its capacity (k at the top, shrinking
  * by ~(2/3)^depth below, floor 8) it is sorted and every other item
  * — chosen by a deterministic seeded coin — is promoted one level.
  * Size is O(k log(n/k)); rank error is O(1/k)·n with high
  * probability. Mergeable (level-wise concat + the same compaction),
  * so it partial-aggregates map-side: the shuffle carries one small
  * sketch per group regardless of input rows — the 100 TB quantile
  * shape. Complements Quantiles.scala's GK bucketizer: KLL is the
  * sketch you persist and keep MERGING across days/partitions;
  * rank-error bound and merge-vs-single-pass agreement pinned in
  * KllSketchSpec.
  *
  * The compaction coin is a fixed-seed xorshift; results are exactly
  * reproducible for a given input ORDER within a partition (retried
  * partitions replay identical input order). Across runs the
  * FINAL-stage merge order of partial buffers is scheduler-dependent,
  * so coin state at merge time — and thus the exact output — is only
  * per-partition-replay deterministic, not globally order-free.
  */
final case class KllSketch(
    child: Expression, k: Int, probabilities: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.Buffer] {

  require(k >= 8, "kll: k must be >= 8")
  require(probabilities.nonEmpty && probabilities.forall(p => p >= 0 && p <= 1),
    "kll: probabilities must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllSketch.Buffer = new KllSketch.Buffer(k)

  override def update(buf: KllSketch.Buffer, input: InternalRow): KllSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => other.toString.toDouble
    })
    buf
  }

  override def merge(a: KllSketch.Buffer, b: KllSketch.Buffer): KllSketch.Buffer = {
    a.mergeIn(b); a
  }

  override def eval(buf: KllSketch.Buffer): Any =
    if (buf.n == 0L) null
    else ArrayData.toArrayData(buf.quantiles(probabilities))

  override def serialize(buf: KllSketch.Buffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.Buffer =
    KllSketch.Buffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketch =
    copy(child = newChildren.head)
}

object KllSketch {

  /** Approximate quantiles of `c` at `probabilities` via a mergeable
    * KLL sketch with parameter `k` (error ~ O(1/k)). */
  def kllQuantiles(c: Column, probabilities: Seq[Double], k: Int = 200): Column =
    GraftColumnBridge.column(
      KllSketch(GraftColumnBridge.expression(c), k, probabilities).toAggregateExpression())

  final class Buffer(val k: Int) {
    private[KllSketch] var levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    var n: Long = 0L
    // deterministic xorshift coin for compaction parity
    private[KllSketch] var rngState: Long = 0x9E3779B97F4A7C15L

    private def coin(): Boolean = {
      rngState ^= rngState << 13
      rngState ^= rngState >>> 7
      rngState ^= rngState << 17
      (rngState & 1L) == 0L
    }

    private def capacity(level: Int): Int = {
      val depth = levels.length - 1 - level
      math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
    }

    private def totalItems: Int = { var s = 0; levels.foreach(s += _.length); s }
    private def totalCapacity: Int = { var s = 0; for (l <- levels.indices) s += capacity(l); s }

    def add(v: Double): Unit = {
      levels(0) += v
      n += 1
      if (totalItems > totalCapacity) compress()
    }

    private def compress(): Unit = {
      var l = 0
      var done = false
      while (l < levels.length && !done) {
        if (levels(l).length > capacity(l)) {
          if (l + 1 == levels.length) levels += ArrayBuffer.empty[Double]
          val sorted = levels(l).sorted
          val keepOdd = coin()
          val promoted = new ArrayBuffer[Double](sorted.length / 2 + 1)
          var i = if (keepOdd) 1 else 0
          while (i < sorted.length) { promoted += sorted(i); i += 2 }
          levels(l + 1) ++= promoted
          levels(l).clear()
          done = true // one compaction per trigger keeps amortized O(1)
        }
        l += 1
      }
    }

    def mergeIn(other: Buffer): Unit = {
      while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
      for (l <- other.levels.indices) levels(l) ++= other.levels(l)
      n += other.n
      while (totalItems > totalCapacity) compress()
    }

    /** Smallest value whose cumulative weight reaches p·n. */
    def quantile(p: Double): Double = quantiles(Seq(p))(0)

    /** All requested quantiles from ONE weighted sort + one cumulative
      * prefix array + a binary search per probability (the
      * per-probability form rebuilt and re-sorted the item list
      * |probabilities| times per group). */
    def quantiles(ps: Seq[Double]): Array[Double] = {
      val weighted = ArrayBuffer.empty[(Double, Long)]
      for (l <- levels.indices; v <- levels(l)) weighted += v -> (1L << l)
      val sorted = weighted.sortBy(_._1)
      val cum = new Array[Long](sorted.length)
      var acc = 0L
      for (i <- sorted.indices) { acc += sorted(i)._2; cum(i) = acc }
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * n).toLong)
        // first index with cum(i) >= target
        var lo = 0; var hi = sorted.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cum(mid) >= target) hi = mid else lo = mid + 1
        }
        sorted(lo)._1
      }.toArray
    }

    def serialize(): Array[Byte] = {
      var size = 4 + 8 + 8 + 4
      levels.foreach(l => size += 4 + l.length * 8)
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.putInt(k); bb.putLong(n); bb.putLong(rngState); bb.putInt(levels.length)
      levels.foreach { l => bb.putInt(l.length); l.foreach(bb.putDouble) }
      bb.array()
    }
  }

  object Buffer {
    def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new Buffer(bb.getInt)
      buf.n = bb.getLong
      buf.rngState = bb.getLong
      val numLevels = bb.getInt
      buf.levels = ArrayBuffer.fill(numLevels)(ArrayBuffer.empty[Double])
      for (l <- 0 until numLevels) {
        val len = bb.getInt
        var i = 0
        while (i < len) { buf.levels(l) += bb.getDouble; i += 1 }
      }
      buf
    }
  }
}
