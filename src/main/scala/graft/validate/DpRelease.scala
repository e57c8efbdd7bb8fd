package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release (Dwork et al. 2006 — the
  * Laplace mechanism): published group counts/sums carry additive
  * Laplace(sensitivity/ε) noise. The privacy sibling of
  * [[Anonymity]]: k-anonymity suppresses small groups from a
  * releasable table; DP noises every released STATISTIC with a
  * provable ε budget.
  *
  * SEEDED noise, deliberately: a real release is published once, and
  * the pipeline that produced it must be re-runnable bit-identically
  * (audits, retries, the repo-wide replayable-determinism
  * discipline) — so noise derives from `md5(seed, group key)` through
  * the inverse CDF, not from an RNG. Publishing the seed would break
  * the guarantee exactly like publishing the noise; the seed is a
  * SECRET of the releasing pipeline.
  *
  * Scale shape: the noise is one narrow projection on the aggregate
  * output (groups-sized, post-shuffle); the aggregation itself is the
  * ordinary map-side-partial groupBy. Noise is floor-quantized to
  * 1e-4 (the cross-engine ln discipline every LM oracle here uses).
  */
object DpRelease {

  /** Laplace(scale) noise via the inverse CDF of a (0,1) uniform:
    * −scale · sign(u − ½) · ln(1 − 2|u − ½|), floor-quantized 1e-4. */
  def laplaceNoise(u: Column, scale: Double): Column = {
    require(scale > 0, s"scale must be positive: $scale")
    val c = u - lit(0.5)
    floor(-lit(scale) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)) * 1e4) / 1e4
  }

  /** ε-DP group counts: (group cols…, n, released) with released =
    * n + Laplace(1/ε) (count sensitivity 1), clamped at 0 — a count
    * release cannot go negative. `n` is returned for pipeline
    * auditing; a real publication drops it. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released",
        greatest(lit(0.0),
          col("n") + laplaceNoise(uniformCol(seed, groupCols), 1.0 / epsilon)))
  }

  /** ε-DP group sums with per-row contribution clamping to [lo, hi]
    * (the clamp IS the sensitivity bound — without it one outlier row
    * breaks the guarantee): released = Σ clamp(v) + Laplace((hi−lo)/ε). */
  def dpSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
             lo: Double, hi: Double, epsilon: Double,
             seed: String): DataFrame = {
    require(epsilon > 0 && hi > lo, s"need epsilon > 0 and hi > lo")
    // per-ROW quantization before the sum: integer partials make the
    // clamped sum order-independent under any partitioning
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(floor(greatest(lit(lo), least(lit(hi),
          col(valueCol).cast("double"))) * 1e4).cast("long")).as("sum_q"))
      .select(groupCols.map(col) :+
        (col("sum_q").cast("double") / 1e4).as("clamped_sum"): _*)
      .withColumn("released",
        col("clamped_sum") +
          laplaceNoise(uniformCol(seed, groupCols), (hi - lo) / epsilon))
  }

  /** [[uniform]] over column NAMES. Built with the Column API (not an
    * expr() SQL splice) so a quote in the seed or a backtick in a
    * column name can't break parsing or shift the expression. */
  private[graft] def uniformCol(seed: String, groupCols: Seq[String]): Column = {
    val parts = lit(seed) +: groupCols.map(c => col(c).cast("string"))
    (conv(substring(md5(concat_ws("|", parts: _*)), 1, 15), 16, 10)
      .cast("long").cast("double") + 0.5) / lit((1L << 60).toDouble)
  }
}
