package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding with additive smoothing
  * (Micci-Barreca 2001) — the feature-engineering primitive that turns
  * a high-cardinality categorical into ONE numeric column: each row
  * gets its category's mean target, EXCLUDING the row itself (else the
  * feature leaks its own label and the downstream model memorizes),
  * shrunk toward the global prior by pseudo-count `m` so rare
  * categories don't encode noise:
  *
  *   te_i = (Σ_cat y − y_i + prior · m) / (n_cat − 1 + m)
  *
  * Exact and engine-reproducible: targets are caller-quantized
  * integers, category sums/counts exact, the prior is one division of
  * exact sums, and each row's encoding is one pinned double chain
  * floored to 10⁻⁶.
  *
  * Scale shape: one category aggregate (map-side combined, rows =
  * |categories|) joined back to the frame — broadcast when the
  * category vocabulary is bounded, shuffle-hash otherwise; no window,
  * no per-row state. */
object TargetEncode {

  /** Adds column `te` to `df`. `targetCol` must be integral (quantize
    * upstream); NULL category or target rows get a NULL encoding and
    * are excluded from the statistics. `m` must be positive — at
    * n_cat = 1 the leave-one-out denominator is m alone (pure prior). */
  def looEncode(df: DataFrame, catCol: String, targetCol: String,
      m: Double = 10.0): DataFrame = {
    require(m > 0, s"smoothing pseudo-count m must be positive: $m")
    val dec = "decimal(38,0)"
    val valid = col(catCol).isNotNull && col(targetCol).isNotNull
    val stats = df.where(valid)
      .groupBy(col(catCol).as("_cat"))
      .agg(count(lit(1)).as("_n"),
        sum(col(targetCol).cast(dec)).as("_s"))
    val glob = df.where(valid)
      .agg(count(lit(1)).as("_gn"), sum(col(targetCol).cast(dec)).as("_gs"))
    val prior = col("_gs").cast("double") / col("_gn")
    val te = floor((col("_s").cast("double") - col(targetCol) +
        prior * m) / (col("_n").cast("double") - 1 + m) * 1000000) / 1000000
    df.join(stats, col(catCol) === col("_cat"), "left")
      .crossJoin(broadcast(glob))
      .withColumn("te", when(valid && col("_n").isNotNull, te))
      .drop("_cat", "_n", "_s", "_gn", "_gs")
  }

  /** Weight of evidence per category + information value — the
    * credit-scoring read on a categorical against a BINARY label
    * (Siddiqi 2006): WoE_k = ln(pos-share_k / neg-share_k) says which
    * way a level votes, IV = Σ (pos-share − neg-share)·WoE says
    * whether the whole column is worth a model's time (< 0.02 useless,
    * > 0.3 strong). Laplace-smoothed by `alpha` per cell so empty
    * cells stay finite. Counts are exact; each WoE is ONE pinned
    * double chain over exact integers (ln on exact-valued operands,
    * the accepted Zipf band), IV terms quantized to 1e-9 before the
    * category-bounded sum. Output one row per level:
    * (category, n, n_pos, woe, iv_term9) — IV = sum(iv_term9)/1e9.
    * One groupBy; rows out = |levels|. */
  def woe(df: DataFrame, catCol: String, labelCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive: $alpha")
    val lab = col(labelCol).cast("long")
    val valid = col(catCol).isNotNull && col(labelCol).isNotNull
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val g = df.where(valid)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(lab).as("n_pos"))
      .select(col("category"), col("n"), col("n_pos"),
        sum("n").over(tot).as("nt"), sum("n_pos").over(tot).as("pt"))
    val k = count(lit(1)).over(tot)
    val posShare = (col("n_pos") + alpha) /
      (col("pt").cast("double") + col("k_levels") * alpha)
    val negShare = (col("n") - col("n_pos") + alpha) /
      (col("nt").cast("double") - col("pt") + col("k_levels") * alpha)
    val w = log(posShare / negShare)
    g.withColumn("k_levels", k)
      .select(col("category"), col("n"), col("n_pos"),
        (floor(w * 1000000) / 1000000).as("woe"),
        floor((posShare - negShare) * w * 1e9).cast("long").as("iv_term9"))
  }
}
