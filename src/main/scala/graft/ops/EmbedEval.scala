package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Intrinsic embedding-quality evaluation — the 38n lesson ("the
  * engine must grade its own gates") applied to the trainers
  * (graft.text.Sgns) and to any ingested vector corpus: a curation
  * pipeline choosing dims/epochs/negatives needs a measured dial, not
  * vibes. Two standard instruments:
  *
  *   - [[neighborPurity]] — label coherence of the vector space: for
  *     each vector, the fraction of its k nearest neighbors (cosine)
  *     sharing its label, aggregated per label. The direct quality
  *     readout for semantic-dedup / clustering uses of the space.
  *   - [[spearman]] — rank correlation between a gold similarity and
  *     the model's cosine over a pair set: the word-similarity-
  *     benchmark form (WordSim/SimLex convention) reduced to its
  *     engine-reproducible skeleton.
  *
  * The reference has no embedding surface at all (its scope ends at
  * row validation — DM_bankfile_validate_pipeline.py); this grades
  * the capability stack built on top.
  */
object EmbedEval {

  /** Per-label neighbor purity at k. Rides [[Ann.knnGraph]] — pass
    * `cells`/`nprobe` for the shuffled IVF scale path (the corpus is
    * never broadcast); labels join back by id (two narrow equi-joins).
    * Purity is exact-integer matched/edges rounded 1e-6, so the
    * result replays identically under any partitioning. `n_edges`
    * can be < n_queries·k only when the corpus (or a probed cell) has
    * fewer than k+1 vectors. */
  def neighborPurity(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, cells: Int = 0, nprobe: Int = 0): DataFrame = {
    val g = Ann.knnGraph(corpus, idCol, vecCol, k, cells, nprobe)
    val qLab = corpus.select(col(idCol).cast("long").as("query_id"),
      col(labelCol).as("_qlbl"))
    val nLab = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(labelCol).as("_nlbl"))
    g.join(qLab, "query_id").join(nLab, "neighbor_id")
      .groupBy(col("_qlbl").as("label"))
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_edges"),
        sum(when(col("_qlbl") === col("_nlbl"), 1L).otherwise(0L))
          .as("n_matched"))
      .select(col("label"), col("n_queries"), col("n_edges"),
        round(col("n_matched").cast("double") / col("n_edges"), 6)
          .as("purity"))
      .orderBy("label")
  }

  /** Spearman rank correlation between `goldCol` and `modelCol` over
    * a pair frame, in the MIN-RANK (SQL `rank()`) convention:
    * deterministic under ties with no arbitrary tie-break and
    * identical in any engine — the average-rank textbook variant
    * needs fractional ranks that float differently across engines,
    * and with integer-quantized scores the two orderings agree on
    * everything but tie plateaus. rho = 1 − 6·Σd²/(n(n²−1)) with Σd²
    * exact in DECIMAL(38,0) (d ≤ n per pair, so a long sum overflows
    * past ~2M pairs); only the final division is floating, rounded
    * 1e-6.
    *
    * Scale shape: the two global rank() windows are single-partition
    * sorts — the pair set is MODEL data (a gold benchmark is
    * thousands of pairs, vocabulary-bounded like centroids or
    * negative-sampling tables), never the corpus; the corpus-sized
    * work (scoring each pair) happens before this call, narrow. */
  def spearman(pairs: DataFrame, goldCol: String,
      modelCol: String): DataFrame = {
    val ranked = pairs.select(
      rank().over(Window.orderBy(col(goldCol).asc)).as("rg"),
      rank().over(Window.orderBy(col(modelCol).asc)).as("rm"))
    val d = (col("rg") - col("rm")).cast("decimal(38,0)")
    ranked
      .agg(count(lit(1)).as("n_pairs"), sum(d * d).as("sum_d2"))
      .select(col("n_pairs"), col("sum_d2").cast("long").as("sum_d2"),
        round(
          lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
            (col("n_pairs").cast("double") *
              (col("n_pairs").cast("double") * col("n_pairs").cast("double") - 1.0)),
          6).as("rho"))
  }
}
