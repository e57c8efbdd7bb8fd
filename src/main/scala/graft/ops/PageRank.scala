package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration integer PageRank — link-structure centrality for
  * derived graphs (purchase bipartites, co-occurrence, near-dup pair
  * graphs), the second iterative-graph operator beside
  * [[ConnectedComponents]] and run with the same discipline: per-round
  * state is one small (node, rank) frame, lineage is cut by periodic
  * localCheckpoint, and each round is ONE distributed join+aggregate —
  * no driver-side graph.
  *
  * All arithmetic is INTEGER: ranks live in 10¹² micro-units, each
  * neighbor contribution is `(r·85) div (100·deg)` (damping 0.85 as an
  * exact integral operation), and the per-node sum is an
  * order-independent BIGINT sum — so the result is bit-identical on
  * any engine, partitioning, or retry, and a SQL oracle can replay a
  * fixed iteration count stage by stage. Truncation remainders mean
  * total mass shrinks slightly per hop (standard in integer PageRank);
  * dangling-node mass is dropped, not redistributed — callers wanting
  * stochastic completeness add explicit sink edges.
  *
  * Scale shape per iteration: edges ⋈ ranks on src (both partitioned
  * by the join key — the edge frame is checkpointed once and its
  * partitioning reused), map-side-combined sum to dst, left join back
  * to the node set. State never exceeds |V| rows; edges stream.
  */
object PageRank {

  /** Ranks after `iters` rounds over directed `(src, dst)` edges.
    * Output: `(node, rank)` — rank in 10¹² micro-units; the initial
    * mass is `10¹² div |V|` per node and `base = (r0·15) div 100` is
    * re-injected each round. `checkpointEvery` bounds lineage (0
    * disables; CC-style localCheckpoint otherwise). */
  def ranks(edges: DataFrame, iters: Int = 5,
      checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // degree rides with every edge once, checkpointed: iterations
    // re-read a materialized (src, dst, deg) frame, not the lineage
    val ed = e.join(deg, "src").localCheckpoint()
    val n = nodes.count()
    require(n > 0, "PageRank on an empty edge frame")
    val r0 = 1000000000000L / n
    val base = (r0 * 15L) / 100L
    var ranks = nodes.withColumn("r", lit(r0))
    for (i <- 1 to iters) {
      val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(r * 85) div (100 * deg)").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) + coalesce(col("m"), lit(0L))).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.withColumnRenamed("r", "rank")
  }
}
