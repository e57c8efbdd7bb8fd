package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k ROWS as one mergeable aggregate — like
  * [[TopKByScore]] but carrying an arbitrary struct payload alongside
  * the (score, tie) rank, so the winners need no join-back to the
  * source: `array<payload-struct>` sorted by (score desc, tie asc).
  *
  * This is the single-pass form of "keep k rows per group": the
  * two-phase shape (id-only top-k, then join winners back) scans the
  * source twice and shuffles the full table once for the join; this
  * aggregate scans ONCE and the shuffle carries only per-task partial
  * winners — at most k rows per (group × task), each the size of the
  * payload struct. For a hot group (one domain owning 60% of a crawl)
  * the map-side heaps reduce its millions of rows to k per task
  * before anything crosses the wire, which is the difference between
  * a bounded shuffle and a single-task window sort at 100 TB.
  *
  * The payload rides as serialized UnsafeRow bytes in the partial
  * buffers; per-task memory is bounded by the task's own input (the
  * sort-based aggregation fallback spills the input, and each group's
  * heap holds at most k payload rows).
  */
final case class TopKRowsByScore(
    scoreExpr: Expression, tieExpr: Expression, payloadExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsByScore.Buf] {

  require(k > 0 && k <= (1 << 20), s"topk_rows_by: k out of range: $k")

  override def children: Seq[Expression] = Seq(scoreExpr, tieExpr, payloadExpr)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, tieExpr.dataType, payloadExpr.dataType) match {
      case (DoubleType, LongType, _: StructType) => TypeCheckResult.TypeCheckSuccess
      case (s, t, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, struct), got " +
          s"(${s.simpleString}, ${t.simpleString}, ${p.simpleString})")
    }
  private def payloadType: StructType = payloadExpr.dataType.asInstanceOf[StructType]
  override def dataType: DataType = ArrayType(payloadType, containsNull = false)
  override def prettyName: String = "topk_rows_by"

  // normalizes any InternalRow payload to a compact UnsafeRow we can
  // copy and serialize; executor-local, rebuilt after deserialization
  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKRowsByScore.Buf =
    new TopKRowsByScore.Buf(k)

  override def update(buf: TopKRowsByScore.Buf, input: InternalRow): TopKRowsByScore.Buf = {
    val s = scoreExpr.eval(input)
    val t = tieExpr.eval(input)
    val p = payloadExpr.eval(input)
    // NaN scores are unrankable (see TopKByScore); null payloads carry
    // nothing worth keeping
    if (s != null && t != null && p != null && !s.asInstanceOf[Double].isNaN) {
      // copy BEFORE insert: Spark reuses the input row's backing buffer
      val row = toUnsafe(p.asInstanceOf[InternalRow]).copy()
      buf.insert(s.asInstanceOf[Double], t.asInstanceOf[Long], row)
    }
    buf
  }

  override def merge(a: TopKRowsByScore.Buf, b: TopKRowsByScore.Buf): TopKRowsByScore.Buf = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ties(i), b.rows(i)); i += 1 }
    a
  }

  override def eval(buf: TopKRowsByScore.Buf): Any = {
    val idx = (0 until buf.size).sortBy(i => (-buf.scores(i), buf.ties(i)))
    new GenericArrayData(idx.map(i => buf.rows(i)).toArray[Any])
  }

  override def serialize(buf: TopKRowsByScore.Buf): Array[Byte] = {
    var total = 8
    var i = 0
    while (i < buf.size) { total += 8 + 8 + 4 + buf.rows(i).getSizeInBytes; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.k).putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putLong(buf.ties(i))
      val bytes = buf.rows(i).getBytes
      bb.putInt(bytes.length).put(bytes)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsByScore.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKRowsByScore.Buf(bb.getInt)
    val n = bb.getInt
    val nFields = payloadType.length
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val t = bb.getLong
      val len = bb.getInt
      val rb = new Array[Byte](len)
      bb.get(rb)
      val row = new UnsafeRow(nFields)
      row.pointTo(rb, len)
      buf.insert(s, t, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRowsByScore =
    copy(scoreExpr = newChildren(0), tieExpr = newChildren(1), payloadExpr = newChildren(2))
}

object TopKRowsByScore {

  /** k-bounded min-heap on (score asc, tie desc) — root is the entry
    * to evict, so retention is the (score desc, tie asc) top-k; same
    * ordering contract as [[TopKByScore.Buf]] with a row payload
    * riding along each entry. */
  final class Buf(val k: Int) {
    var scores = new Array[Double](math.min(k, 16))
    var ties = new Array[Long](math.min(k, 16))
    var rows = new Array[UnsafeRow](math.min(k, 16))
    var size = 0

    private def worse(s1: Double, t1: Long, s2: Double, t2: Long): Boolean =
      s1 < s2 || (s1 == s2 && t1 > t2)

    def insert(s0: Double, t: Long, row: UnsafeRow): Unit = {
      val s = if (s0 == 0.0) 0.0 else s0 // -0.0 → 0.0, see TopKByScore
      if (size < k) {
        if (size == scores.length) {
          val cap = math.min(k, scores.length * 2)
          scores = java.util.Arrays.copyOf(scores, cap)
          ties = java.util.Arrays.copyOf(ties, cap)
          rows = java.util.Arrays.copyOf(rows, cap)
        }
        scores(size) = s; ties(size) = t; rows(size) = row; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ties(0), s, t)) {
        scores(0) = s; ties(0) = t; rows(0) = row
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ties(i), scores(p), ties(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ties(l), scores(m), ties(m))) m = l
        if (r < size && worse(scores(r), ties(r), scores(m), ties(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val tt = ties(a); ties(a) = ties(b); ties(b) = tt
      val tr = rows(a); rows(a) = rows(b); rows(b) = tr
    }
  }

  /** Aggregate rows into the group's top-k by (score desc, tie asc),
    * each output element the full `payload` struct. */
  def topKRowsBy(score: Column, tie: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(TopKRowsByScore(
      GraftColumnBridge.expression(score),
      GraftColumnBridge.expression(tie),
      GraftColumnBridge.expression(payload), k).toAggregateExpression())
}
