package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the marketing-analytics
  * counterpart of funnel analysis: every conversion's credit is split
  * over the touch path that preceded it, per channel, under the three
  * standard models at once (first-touch, last-touch, linear).
  *
  * Path semantics: a conversion's path is the set of touches by the
  * same user strictly AFTER the user's previous conversion and
  * strictly BEFORE the conversion itself — the "since last
  * conversion" window, so one touch never earns credit twice.
  * Conversions with an empty path earn nothing (no "direct" bucket —
  * callers wanting one union a synthetic touch in).
  *
  * All credit is integral: first/last are counts; linear splits
  * 1,000,000 micro-credits as `1000000 div n` per touch with the
  * remainder assigned to the LAST touch (position order is the
  * deterministic `(ts, id)`), so per-channel sums are exact BIGINTs,
  * engine-reproducible, and total exactly 10⁶ × attributed
  * conversions.
  *
  * Scale shape: one equi-join on user (range predicates ride as join
  * filters; per-user event counts bound the multiplicity), then two
  * windows partitioned by conversion id — path-length-bounded, never
  * corpus-wide. No collect, no cartesian.
  */
object Attribution {

  /** Per-channel credit under all three models. `touches`:
    * `(user, ts, id, channel)`; `conversions`: `(user, ts, id)` —
    * `ts` any orderable type used consistently across both frames.
    * Output: `(channel, first_touch, last_touch, linear_micro)`. */
  def byChannel(touches: DataFrame, conversions: DataFrame): DataFrame = {
    val convW = Window.partitionBy("user").orderBy(col("ts"), col("id"))
    val conv2 = conversions
      .withColumn("pts", lag(col("ts"), 1).over(convW))
      .select(col("user").as("cu"), col("ts").as("cts"),
        col("id").as("cid"), col("pts"))
    val path = touches.join(conv2,
        col("user") === col("cu") && col("ts") < col("cts") &&
          (col("pts").isNull || col("ts") > col("pts")))
      .select(col("cid"), col("channel"), col("ts"), col("id"))
    val pw = Window.partitionBy("cid").orderBy(col("ts"), col("id"))
    val nw = Window.partitionBy("cid")
    path
      .withColumn("rn", row_number().over(pw))
      .withColumn("n", count(lit(1)).over(nw))
      .select(col("channel"),
        when(col("rn") === 1, 1L).otherwise(0L).as("ft"),
        when(col("rn") === col("n"), 1L).otherwise(0L).as("lt"),
        (expr("1000000L div n") + when(col("rn") === col("n"),
          expr("1000000L % n")).otherwise(lit(0L))).as("lin"))
      .groupBy("channel")
      .agg(sum("ft").as("first_touch"), sum("lt").as("last_touch"),
        sum("lin").as("linear_micro"))
  }
}
