package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — DeepWalk/node2vec's
  * front half (Perozzi et al. 2014): sample walks from a graph, feed
  * them to a word2vec pipeline ([[graft.text.SkipGram]] here) and the
  * node embeddings fall out. The engine's twist: NO RNG state — the
  * step-i hop of walk w is `neighbors[xxhash64(seed, w, i) mod deg]`
  * against a rank-indexed adjacency, so walks are reproducible on any
  * cluster, any partitioning, any retry (the same property every
  * sampler in this repo has), while remaining uniform over neighbors
  * per step.
  *
  * Scale shape per step: one equi-join of the frontier against the
  * rank-indexed adjacency on the current node (the hash-picked rank
  * rides as a join filter), exactly the PageRank round shape; the
  * adjacency is checkpointed once and reused, frontier rows carry
  * their growing path array (walkLen-bounded), dead-end walks leave
  * the frontier and keep their shorter path. */
object RandomWalks {

  /** `walksPerNode` walks of up to `walkLen` hops from every node of
    * the directed `(src, dst)` edge frame. Output: `(walk_id, path)`
    * — path an array of node ids (strings), length walkLen+1 unless a
    * dead end cut it short. */
  def walks(edges: DataFrame, walksPerNode: Int, walkLen: Int,
      seed: String = "walk"): DataFrame = {
    require(walksPerNode >= 1 && walkLen >= 1)
    val e0 = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
      .localCheckpoint(eager = false)
    val idx = e0
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy("dst")) - 1)
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .repartition(col("src"))
      .localCheckpoint(eager = false)
    val nodes = e0.select(col("src").as("node")).distinct()
    var frontier = nodes
      .select(col("node"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("w"))
      .select(concat_ws("#", col("node"), col("w")).as("walk_id"),
        col("node").as("cur"), array(col("node")).as("path"))
      .localCheckpoint(eager = false)
    var done: DataFrame = null
    for (step <- 1 to walkLen) {
      val pick = pmod(xxhash64(lit(seed), col("walk_id"), lit(step)),
        col("deg"))
      val stepped = frontier.join(idx,
          col("cur") === col("src") && col("rank") === pick, "left")
        .select(col("walk_id"),
          col("dst").as("cur"),
          when(col("dst").isNotNull,
            concat(col("path"), array(col("dst"))))
            .otherwise(col("path")).as("path"),
          col("dst").isNull.as("dead"))
        .localCheckpoint()
      val ended = stepped.where(col("dead") || lit(step == walkLen))
        .select(col("walk_id"), col("path"))
      done = if (done == null) ended else done.union(ended)
      frontier = stepped.where(!col("dead") && lit(step < walkLen))
        .select(col("walk_id"), col("cur"), col("path"))
    }
    done
  }
}
