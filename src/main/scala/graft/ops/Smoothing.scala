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

  /** Two-sided CUSUM change detection per key — the sequential
    * complement of [[graft.ops.Changepoint]]'s retrospective argmax:
    * S⁺ accumulates excursions above `target + slack`, S⁻ below
    * `target − slack` (each clamped at 0), and a step whose
    * accumulator exceeds `threshold` is an alert. The classic
    * small-persistent-shift detector (Page 1954): a one-off spike
    * decays back through the clamp, a sustained drift accumulates.
    * Same collect-then-fold shape and replay contract as
    * [[ewmaLevel]]; the unbounded-stream form is
    * [[graft.streaming.EventStreams.cusumLevels]], which folds the
    * identical recurrence statefully (parity pinned in spec).
    *
    * Output per key: `(key, n, n_alerts, first_alert, sp, sn)` —
    * first_alert is the 1-based step index of the first threshold
    * crossing (-1 if none); sp/sn are the final accumulators floored
    * to 10⁻⁶. */
  def cusumAlerts(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(slack >= 0 && threshold > 0, s"bad slack=$slack threshold=$threshold")
    val series = sort_array(collect_list(struct(
      col(orderCol), col(tieCol), col(valueCol).cast("double").as("v"))))
    val vals = transform(col("_s"), x => x.getField("v"))
    val init = struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
      lit(0L).as("na"), lit(-1L).as("first"), lit(0L).as("i"))
    val folded = aggregate(vals, init, (acc, x) => {
      val i2 = acc.getField("i") + 1
      val sp2 = greatest(lit(0.0),
        acc.getField("sp") + (x - lit(target) - lit(slack)))
      val sn2 = greatest(lit(0.0),
        acc.getField("sn") + (lit(target) - x - lit(slack)))
      val alert = sp2 > threshold || sn2 > threshold
      struct(sp2.as("sp"), sn2.as("sn"),
        (acc.getField("na") + when(alert, 1L).otherwise(0L)).as("na"),
        when(acc.getField("first") === -1L && alert, i2)
          .otherwise(acc.getField("first")).as("first"),
        i2.as("i"))
    })
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("_s"))
      .select(col(keyCol), size(col("_s")).cast("long").as("n"),
        folded.as("_f"))
      .select(col(keyCol), col("n"),
        col("_f.na").as("n_alerts"), col("_f.first").as("first_alert"),
        (floor(col("_f.sp") * 1e6) / 1e6).as("sp"),
        (floor(col("_f.sn") * 1e6) / 1e6).as("sn"))
  }
}
