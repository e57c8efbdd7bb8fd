package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STL-lite seasonal decomposition — value = trend + seasonal +
  * residual, the structure behind every "is this dip real or just
  * Sunday" monitoring question, sitting between [[Trend]]'s single
  * line and the seasonal-naive comparator: trend is a centered moving
  * average, the seasonal index is the per-phase mean of the detrended
  * series, and what remains is the anomaly-bearing residual.
  *
  * Engine-reproducible: values are integral, the moving-average
  * window sums are exact BIGINTs, and each mean is
  * `floor(exact / exact)` — one IEEE division on exact-integer
  * doubles, so trend/seasonal/residual are all exact BIGINTs on any
  * engine or partitioning.
  *
  * Scale shape: two windows per key (series-bounded: the centered MA
  * frame and the phase rank) and one (key, phase) aggregate — never a
  * corpus-wide sort or driver loop. */
object Seasonal {

  /** Row-level decomposition. Input: `(keyCol, orderCol, valueCol)`
    * with integral values, `orderCol` unique per key. Output adds
    * `(phase, trend, seasonal, residual)` — phase is the 0-based
    * position mod `period`; trend is the centered MA over
    * `period div 2` rows each side (shorter at the edges — the
    * window simply has fewer rows there). */
  def decompose(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, period: Int): DataFrame = {
    require(period >= 2, s"period $period must be >= 2")
    val h = period / 2
    val wMa = Window.partitionBy("key").orderBy("t")
      .rowsBetween(-h, h)
    val wRank = Window.partitionBy("key").orderBy("t")
    val base = df.select(col(keyCol).as("key"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("v"))
      .withColumn("trend",
        floor(sum("v").over(wMa).cast("double") /
          count(lit(1)).over(wMa).cast("double")).cast("long"))
      .withColumn("phase",
        ((row_number().over(wRank) - 1) % period).cast("int"))
      .withColumn("det", col("v") - col("trend"))
    val wPhase = Window.partitionBy("key", "phase")
    base
      .withColumn("seasonal",
        floor(sum("det").over(wPhase).cast("double") /
          count(lit(1)).over(wPhase).cast("double")).cast("long"))
      .withColumn("residual", col("det") - col("seasonal"))
      .select(col("key"), col("t"), col("v"), col("phase"), col("trend"),
        col("seasonal"), col("residual"))
  }

  /** Per-(key, phase) summary of [[decompose]]: the seasonal index,
    * observation count, and the residual mean square (floored) —
    * the "how seasonal is this series, and how noisy after removing
    * it" report. */
  def phaseSummary(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, period: Int): DataFrame =
    decompose(df, keyCol, orderCol, valueCol, period)
      .groupBy("key", "phase")
      .agg(count(lit(1)).as("n"),
        max("seasonal").as("seasonal"),
        floor(sum(col("residual") * col("residual")).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("res_ms"))
}
