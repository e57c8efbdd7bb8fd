package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage (Fellegi & Sunter 1969 shape):
  * BLOCK → pairwise field similarity → threshold → transitive closure
  * into entity clusters. The classic duplicate-customer / merged-
  * account problem, built from owned machinery end to end.
  *
  * Scale shape — the whole point of blocking: candidate pairs are
  * generated ONLY within a blocking key (one self-equi-join on the
  * key), never corpus² — the same never-all-pairs discipline as the
  * LSH/banding dedup paths. A `maxBlockSize` cap drops oversized
  * blocks (a degenerate key like an empty string would otherwise
  * quadratically explode one reducer — the hot-bucket cap trade every
  * banded path here makes, documented recall cost). Scoring is a
  * narrow per-pair projection; the closure is the pointer-jumping /
  * driver-folded [[ConnectedComponents]].
  *
  * Determinism: similarity = 1 − lev/maxlen per field, weighted mean
  * floor-quantized to 4 decimals before thresholding — replayable
  * verbatim in the DuckDB oracle (both engines implement classic
  * Levenshtein).
  */
object RecordLinkage {

  /** Per-field weighted similarity score in [0,1], floor-quantized to
    * 4 decimals. Null fields score 0 for their weight (a missing
    * value is evidence of nothing). */
  def pairScore(fields: Seq[(Column, Column, Double)]): Column = {
    require(fields.nonEmpty, "at least one field to compare")
    val totalW = fields.map(_._3).sum
    val sum = fields.map { case (a, b, w) =>
      val sim = when(a.isNull || b.isNull, lit(0.0)).otherwise(
        lit(1.0) - levenshtein(a, b).cast("double") /
          greatest(length(a), length(b), lit(1)).cast("double"))
      sim * lit(w)
    }.reduce(_ + _)
    floor(sum / lit(totalW) * 1e4) / 1e4
  }

  /** Candidate pairs (id1 < id2) sharing a blocking key, each pair
    * scored over `compareCols` (field name → weight). Blocks larger
    * than `maxBlockSize` are dropped entirely (0 = unlimited). Output:
    * (id1, id2, score) for score ≥ threshold. */
  def scoredPairs(df: DataFrame, idCol: String, blockCol: Column,
                  compareCols: Seq[(String, Double)], threshold: Double,
                  maxBlockSize: Long = 0L): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"threshold: $threshold")
    val recs = df.select(col(idCol).cast("long").as("_id") +:
        blockCol.as("_blk") +: compareCols.map { case (c, _) => col(c) }: _*)
      .where(col("_blk").isNotNull)
    val blocked = if (maxBlockSize > 0) {
      val hot = recs.groupBy("_blk").count()
        .where(col("count") > maxBlockSize).select("_blk")
      recs.join(broadcast(hot), Seq("_blk"), "left_anti")
    } else recs
    val left = blocked.select(col("_blk"), col("_id").as("id1"),
      struct(compareCols.map(c => col(c._1)): _*).as("_f1"))
    val right = blocked.select(col("_blk"), col("_id").as("id2"),
      struct(compareCols.map(c => col(c._1)): _*).as("_f2"))
    left.join(right, Seq("_blk"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        pairScore(compareCols.map { case (c, w) =>
          (col("_f1").getField(c), col("_f2").getField(c), w)
        }).as("score"))
      .where(col("score") >= threshold)
  }

  /** Cross-TABLE linkage (the two-source master-data match, e.g. two
    * customer systems): candidates block across tables only — no
    * within-table pairs — scored like [[scoredPairs]]; `bestPerLeft`
    * keeps each left record's single best match (score desc, right id
    * asc) via the bounded-heap top-k aggregate, never a window.
    * Output: (left_id, right_id, score). */
  def linkTables(left: DataFrame, right: DataFrame, idCol: String,
                 blockCol: Column, compareCols: Seq[(String, Double)],
                 threshold: Double, maxBlockSize: Long = 0L,
                 bestPerLeft: Boolean = false): DataFrame = {
    require(threshold >= 0 && threshold <= 1, s"threshold: $threshold")
    def prep(df: DataFrame, side: String) =
      df.select(col(idCol).cast("long").as(side + "_id") +:
          blockCol.as("_blk") +:
          compareCols.map { case (c, _) => col(c) }: _*)
        .where(col("_blk").isNotNull)
    val l0 = prep(left, "left")
    val r0 = prep(right, "right")
    val (l, r) = if (maxBlockSize > 0) {
      val hot = l0.groupBy("_blk").count().where(col("count") > maxBlockSize)
        .select("_blk")
        .unionByName(r0.groupBy("_blk").count()
          .where(col("count") > maxBlockSize).select("_blk"))
        .distinct()
      (l0.join(broadcast(hot), Seq("_blk"), "left_anti"),
        r0.join(broadcast(hot), Seq("_blk"), "left_anti"))
    } else (l0, r0)
    val lf = l.select(col("_blk"), col("left_id"),
      struct(compareCols.map(c => col(c._1)): _*).as("_f1"))
    val rf = r.select(col("_blk"), col("right_id"),
      struct(compareCols.map(c => col(c._1)): _*).as("_f2"))
    val scored = lf.join(rf, Seq("_blk"))
      .select(col("left_id"), col("right_id"),
        pairScore(compareCols.map { case (c, w) =>
          (col("_f1").getField(c), col("_f2").getField(c), w)
        }).as("score"))
      .where(col("score") >= threshold)
    if (!bestPerLeft) scored
    else scored
      .groupBy(col("left_id").as("query_id"))
      .agg(graft.expr.TopKByScore.topKBy(col("score"), col("right_id"), 1).as("top"))
      .select(col("query_id").as("left_id"),
        col("top").getItem(0).getField("id").as("right_id"),
        col("top").getItem(0).getField("score").as("score"))
  }

  /** Full linkage: scored pairs closed transitively into entity
    * clusters. Every record gets a cluster (min linked id); singletons
    * cluster alone. Output: (id, entity). */
  def linkClusters(df: DataFrame, idCol: String, blockCol: Column,
                   compareCols: Seq[(String, Double)], threshold: Double,
                   maxBlockSize: Long = 0L): DataFrame = {
    val pairs = scoredPairs(df, idCol, blockCol, compareCols, threshold,
      maxBlockSize)
    val selfEdges = df.select(col(idCol).cast("long").as("src"))
      .select(col("src"), col("src").as("dst"))
    ConnectedComponents.components(
        pairs.select(col("id1").as("src"), col("id2").as("dst"))
          .union(selfEdges))
      .select(col("id").as(idCol), col("component").as("entity"))
  }
}
