package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf power-law fit for token frequency distributions — the
  * canonical corpus-health statistic: natural text follows
  * freq ∝ rank^(−α) with α ≈ 1; a corpus whose α drifts far from 1
  * (template spam flattens it, deduplication artifacts steepen it)
  * fails the smell test before any LM sees it. Reported as the OLS
  * slope of log-freq on log-rank over the top-K tokens.
  *
  * Engine-reproducible by integer-quantizing the logs FIRST:
  * x = round(ln(rank)·1000), y = round(ln(freq)·1000) are BIGINTs, so
  * all four OLS sums are exact integer arithmetic in any summation
  * order; the single closing division (and the 10⁻⁶ output floor) is
  * one deterministic IEEE-754 step identical on every engine.
  *
  * Scale shape: one token explode + count aggregate (map-side
  * combined), then the top-K by a bounded global sort of the
  * GROUPED frame (vocabulary-sized, not corpus-sized), then a K-row
  * fit. The corpus is touched exactly once.
  */
object Zipf {

  /** OLS fit over the top-`k` tokens (freq desc, token asc).
    * Output: one row `(top_k, slope, intercept)` — slope/intercept of
    * log-freq on log-rank, both floored to 10⁻⁶. */
  def fit(docs: DataFrame, textCol: String, k: Int = 1000): DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    val toks = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)
    val ranked = toks.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
    val pts = ranked.select(
      round(log(col("rank").cast("double")) * 1000).cast("long").as("x"),
      round(log(col("freq").cast("double")) * 1000).cast("long").as("y"))
    val sums = pts.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    sums.select(col("n").as("top_k"),
      (floor((col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        * 1000000) / 1000000).as("slope"),
      (floor((col("sy").cast("double") -
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          * col("sx").cast("double")) / col("n").cast("double")
        / 1000.0 * 1000000) / 1000000).as("intercept"))
  }
}
