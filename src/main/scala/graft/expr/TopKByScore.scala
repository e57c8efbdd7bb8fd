package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k (score, id) pairs as one mergeable aggregate —
  * `array<struct<score double, id long>>` sorted by (score desc, id
  * asc), ties and the k-boundary resolved deterministically toward
  * the smaller id.
  *
  * This is the shuffle-shape fix for the ubiquitous "top-k per group"
  * pattern: the window form (`row_number() over (partition by g order
  * by s desc) <= k`) shuffles EVERY row to its group's partition and
  * sorts there; this aggregate keeps a k-bounded heap per group per
  * map task, so partials combine map-side and the shuffle carries at
  * most k entries per (group × task) regardless of group size — the
  * difference between moving a 100 TB fact table and moving k rows
  * per group.
  */
final case class TopKByScore(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k > 0 && k <= (1 << 20), s"topk_by: k out of range: $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKByScore.Buf = new TopKByScore.Buf(k)

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // NaN scores are unrankable (every comparison is false, so one
    // would enter the heap and never be evicted) — skip them like nulls
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKByScore.Buf, b: TopKByScore.Buf): TopKByScore.Buf = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKByScore.Buf): Any = {
    // (score desc, id asc) — deterministic output order
    val idx = (0 until buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    new GenericArrayData(idx.map(i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))).toArray[Any])
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKByScore.Buf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {

  /** k-bounded min-heap on (score asc, id desc): the root is the entry
    * to evict — the worst score, largest id on ties — so the retained
    * set is exactly the (score desc, id asc) top-k. */
  final class Buf(val k: Int) {
    var scores = new Array[Double](math.min(k, 16))
    var ids = new Array[Long](math.min(k, 16))
    var size = 0

    // true iff (s1, i1) ranks BELOW (s2, i2): worse score, or equal
    // score with larger id
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def insert(s0: Double, id: Long): Unit = {
      // normalize -0.0 → 0.0: the heap's primitive < treats them as
      // equal while eval's sort (boxed total ordering) would not —
      // retention and output ordering must agree on ONE ordering
      val s = if (s0 == 0.0) 0.0 else s0
      if (size < k) {
        if (size == scores.length) {
          val cap = math.min(k, scores.length * 2)
          scores = java.util.Arrays.copyOf(scores, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
        }
        scores(size) = s; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** Aggregate (score, id) rows into the group's top-k, sorted by
    * (score desc, id asc). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(TopKByScore(
      GraftColumnBridge.expression(score),
      GraftColumnBridge.expression(id), k).toAggregateExpression())
}
