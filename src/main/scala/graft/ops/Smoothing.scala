package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential smoothing over per-key event series — the classic
  * recency-weighted level (EWMA) behind rate monitoring, per-user
  * engagement scores, and anomaly baselines. EWMA is inherently
  * sequential (level_i = (1−α)·level_{i−1} + α·x_i), which no window
  * frame expresses; the Spark-native shape for BOUNDED per-entity
  * series is collect-then-fold: one groupBy gathers each key's series
  * in deterministic (order, tie) order, and a higher-order `aggregate`
  * folds it left in one pass — per-key memory is the series length,
  * the right trade for per-user/per-device series (an UNBOUNDED
  * stream's EWMA belongs in stateful streaming, not batch).
  *
  * Replay contract: the fold is the same left-to-right IEEE sequence
  * in any engine (DuckDB's list_reduce seeds with the first element,
  * exactly this formulation), so with a binary-exact α (0.25, 0.5,
  * 0.75 — anything whose (1−α) is exact in binary) the result is
  * bit-identical; the output still floor-quantizes to 6 digits as
  * belt-and-braces. */
object Smoothing {

  /** Final smoothed level per key: fold of the key's `valueCol`
    * series ordered by (orderCol, tieCol), seeded with the first
    * value. Output: (keyCol, n, level). */
  def ewmaLevel(df: DataFrame, keyCol: String, orderCol: String,
                tieCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val series = sort_array(collect_list(struct(
      col(orderCol), col(tieCol), col(valueCol).cast("double").as("v"))))
    val vals = transform(col("_s"), x => x.getField("v"))
    val level = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      element_at(vals, 1),
      (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha))
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("_s"))
      .select(col(keyCol), size(col("_s")).cast("long").as("n"),
        (floor(level * 1e6) / 1e6).as("level"))
  }
}
