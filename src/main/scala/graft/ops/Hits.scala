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
    * out-edges have hub 0, no in-edges authority 0. */
  def scores(edges: DataFrame, iters: Int = 5,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    val dec = "decimal(38,0)"
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val bySrc = e.repartition(col("src")).localCheckpoint(eager = false)
    val byDst = e.repartition(col("dst")).localCheckpoint(eager = false)
    val one = lit(1000000000000L)
    var hub = nodes.withColumn("h", one)
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      // authority step: a(v) = Σ h(u) over u→v, max-normalized
      val aSum = byDst.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("h").cast(dec)).as("s"))
      val aMax = aSum.agg(max("s").as("smax"))
      val aN = aSum.crossJoin(broadcast(aMax))
        .select(col("node"),
          expr("(s * 1000000000000) div smax").as("a"))
      auth = nodes.join(aN, Seq("node"), "left")
        .select(col("node"), coalesce(col("a"), lit(0L)).as("a"))
      // hub step: h(u) = Σ a(v) over u→v, max-normalized
      val hSum = bySrc.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("a").cast(dec)).as("s"))
      val hMax = hSum.agg(max("s").as("smax"))
      val hN = hSum.crossJoin(broadcast(hMax))
        .select(col("node"),
          expr("(s * 1000000000000) div smax").as("h"))
      hub = nodes.join(hN, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("h"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        hub = hub.localCheckpoint()
        auth = auth.localCheckpoint()
      }
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }
}
