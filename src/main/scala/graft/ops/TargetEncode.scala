package graft.ops

import org.apache.spark.sql.DataFrame
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
}
