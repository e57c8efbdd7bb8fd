package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the directed complement
  * of [[PageRank]]: a good HUB points at good authorities, a good
  * AUTHORITY is pointed at by good hubs. On purchase bipartites it
  * separates breadth-buyers from widely-bought-from sellers; on link
  * graphs, directories from destinations — structure a single
  * centrality score conflates.
  *
  * All-integer, [[PageRank]]'s discipline: scores live in 10¹²
  * micro-units; each half-step is ONE edges⋈scores equi-join +
  * order-independent DECIMAL(38,0) sum, then MAX-normalization back
  * to the 10¹² grid via exact integral division (max-norm keeps the
  * ranking of the L2-normalized classic and replays exactly — an L2
  * norm would put an order-sensitive float sqrt inside every round).
  * Fixed `iters` rounds, so a SQL oracle can unroll stage by stage;
  * bit-identical on any partitioning or retry.
  *
  * Scale shape per round: two joins on the checkpointed edge frame
  * (src- and dst-partitioned copies, pinned once), two map-side-
  * combined sums, two scalar-max broadcasts. State = one (node,
  * score) frame per side. */
object Hits {

  /** Hub/authority scores after `iters` rounds over directed
    * `(src, dst)` edges (deduped internally). Output:
    * `(node, hub, authority)` in 10¹² micro-units — nodes with no
    * out-edges have hub 0, no in-edges authority 0.
    *
    * Shuffle shape is picked ONCE by node count (r16 — the r15 scale
    * suite's worst curve, 2.75× at 10×, was this regime boundary left
    * to the auto-broadcast threshold, which the derived score frames
    * drift past as data grows):
    *  - `≤ broadcastNodeLimit` nodes: score frames are explicitly
    *    broadcast into each half-step join, so the edge frame pinned
    *    on the AGGREGATION key (byDst for the a-step's groupBy dst)
    *    flows through the join and the aggregate reuses its exchange
    *    — ZERO edge shuffles per half-step;
    *  - above it: scores are too big to ship, so each half-step joins
    *    the copy pinned on the JOIN key (bySrc for the a-step, since
    *    hub scores key on src) and pays exactly ONE shuffle — the
    *    joined frame into the aggregate — which is the floor for a
    *    shuffle join. */
  def scores(edges: DataFrame, iters: Int = 5,
      checkpointEvery: Int = 4,
      broadcastNodeLimit: Long = 4000000L,
      driverFoldEdges: Long = ConnectedComponents.DriverFoldEdges): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    val dec = "decimal(38,0)"
    val e = edges.select(col("src"), col("dst"))
      .localCheckpoint(eager = false)
    // bounded driver fold (r20, the CC/PageRank tier): every half-step
    // is a graph-sized job; the fold replays the same integer sums and
    // (s·10¹²) div smax normalization (Long sums are exact under the
    // 2M-edge budget: ≤ 2M·10¹² < 2⁶³; the division runs in BigInt
    // like the decimal(38,0) plan). Bit-identical, parity-tested.
    if (PageRank.foldable(e, driverFoldEdges))
      return scoresLocal(e, iters)
    // node set pre-partitioned by node: every round's two left joins
    // land on this exchange instead of re-shuffling the full node set
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).localCheckpoint(eager = false)
    val small = nodes.count() <= broadcastNodeLimit
    // dedupe rides each pin's OWN shuffle instead of a separate
    // distinct() exchange: hash(src) clusters equal (src,dst) pairs,
    // so dropDuplicates after the repartition is partition-local and
    // the pin's partitioning survives for every round's join/agg reuse
    val bySrc = e.repartition(col("src")).dropDuplicates("src", "dst")
      .localCheckpoint(eager = false)
    val byDst = e.repartition(col("dst")).dropDuplicates("src", "dst")
      .localCheckpoint(eager = false)
    val one = lit(1000000000000L)
    // scores stay SPARSE inside the loop: a node absent from the
    // frame is exactly a zero score, and zeros contribute nothing to
    // either half-step's sum — densifying against the full node set
    // every round (the r15 shape) paid two extra joins per round for
    // rows the next join immediately dropped. Round 1's hub input is
    // the full node set at 1.
    var hub = nodes.withColumn("h", one)
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      // authority step: a(v) = Σ h(u) over u→v, max-normalized.
      // Each sum frame is PINNED (localCheckpoint) before use: it
      // feeds both the max broadcast and the score projection, and
      // un-pinned those two subtrees each re-execute the edges⋈scores
      // join+agg — and round N's plan re-executes every prior round's
      // under each of its broadcasts, the compounding that bent the
      // 10× scale curve. Pinning is cheap: one row per scored node.
      val hubBySrc = hub.withColumnRenamed("node", "src")
      val aSum = (if (small) byDst.join(broadcast(hubBySrc), "src")
                  else bySrc.join(hubBySrc, "src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("h").cast(dec)).as("s"))
        .localCheckpoint(eager = false)
      val aMax = aSum.agg(max("s").as("smax"))
      auth = aSum.crossJoin(broadcast(aMax))
        .select(col("node"),
          expr("(s * 1000000000000) div smax").as("a"))
      // hub step: h(u) = Σ a(v) over u→v, max-normalized
      val authByDst = auth.withColumnRenamed("node", "dst")
      val hSum = (if (small) bySrc.join(broadcast(authByDst), "dst")
                  else byDst.join(authByDst, "dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("a").cast(dec)).as("s"))
        .localCheckpoint(eager = false)
      val hMax = hSum.agg(max("s").as("smax"))
      hub = hSum.crossJoin(broadcast(hMax))
        .select(col("node"),
          expr("(s * 1000000000000) div smax").as("h"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        hub = hub.localCheckpoint()
        auth = auth.localCheckpoint()
      }
    }
    // densify ONCE: nodes with no out-edges get hub 0, no in-edges
    // authority 0
    nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"),
        coalesce(col("a"), lit(0L)).as("authority"))
  }

  /** Driver fold of [[scores]] — the same recurrence edge by edge:
    * edges dedupe null-safely (dropDuplicates semantics), a null
    * endpoint never matches a score row (SQL join), but a null-keyed
    * SUM group still participates in the max (the distributed groupBy
    * keeps it); the final densify joins on node, so null-keyed scores
    * drop and the null node (if present) reads 0/0. */
  private def scoresLocal(e: DataFrame, iters: Int): DataFrame = {
    val spark = e.sparkSession
    val one = 1000000000000L
    val in = new PageRank.NodeIntern
    val dedup = new java.util.LinkedHashSet[Long]() // (srcId << 32) | dstId
    e.collect().foreach { r =>
      val s = in.id(r.get(0)); val d = in.id(r.get(1))
      dedup.add((s.toLong << 32) | (d.toLong & 0xffffffffL))
    }
    val n = in.values.length
    val nullId = in.nullId
    val srcA = new Array[Int](dedup.size)
    val dstA = new Array[Int](dedup.size)
    var k = 0
    dedup.forEach { p =>
      srcA(k) = (p >>> 32).toInt; dstA(k) = p.toInt; k += 1
    }
    // sparse scores as (present, value) slot pairs
    var hub = Array.fill(n)(true)
    var hubV = Array.fill(n)(one)
    var auth = new Array[Boolean](n)
    var authV = new Array[Long](n)
    // sum by `group` over edges whose `lookup` endpoint has a score;
    // a null lookup never joins, a null GROUP key still sums (and
    // feeds the max) — the distributed groupBy keeps it
    def halfStep(inP: Array[Boolean], inV: Array[Long],
        lookupA: Array[Int], groupA: Array[Int])
        : (Array[Boolean], Array[Long]) = {
      val sumP = new Array[Boolean](n)
      val sumV = new Array[Long](n)
      var i = 0
      while (i < lookupA.length) {
        val l = lookupA(i)
        if (l != nullId && inP(l)) {
          val g = groupA(i)
          sumP(g) = true
          sumV(g) += inV(l)
        }
        i += 1
      }
      var smax = Long.MinValue
      var any = false
      i = 0
      while (i < n) {
        if (sumP(i)) { any = true; if (sumV(i) > smax) smax = sumV(i) }
        i += 1
      }
      if (!any) return (sumP, sumV)
      val smaxB = BigInt(smax)
      i = 0
      while (i < n) {
        if (sumP(i)) sumV(i) = ((BigInt(sumV(i)) * one) / smaxB).toLong
        i += 1
      }
      (sumP, sumV)
    }
    for (_ <- 1 to iters) {
      val a = halfStep(hub, hubV, srcA, dstA)
      auth = a._1; authV = a._2
      val h = halfStep(auth, authV, dstA, srcA)
      hub = h._1; hubV = h._2
    }
    PageRank.localScoreDf(spark, e.schema.fields(0).dataType, in.values,
      Seq("hub", "authority"),
      v => Seq(
        if (v != nullId && hub(v)) hubV(v) else 0L,
        if (v != nullId && auth(v)) authV(v) else 0L))
  }
}
