package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a feed — the
  * "this month's file looks nothing like last month's" check that row
  * rules can't express (every row can be individually valid while the
  * population shifts).
  *
  * Reference analogue: the validation pipeline compares error COUNTS
  * between runs (/root/reference/DM_bankfile_validate_pipeline.py:786);
  * this generalizes to whole-column distribution compare.
  *
  * Scale shape: each snapshot is scanned ONCE — columns are unpivoted
  * with stack() into (col_name, value) pairs (narrow), then one
  * groupBy(col_name, bin) per side; the per-bin tables that meet are
  * tiny (cols × bins), so the final join/compare is driver-scale.
  * Never a per-column scan loop.
  */
object Drift {

  /** Population Stability Index per numeric column. Bin edges come from
    * the BASELINE's min/max (one tiny agg) so the comparison frame is
    * fixed; values outside land in the edge bins. psi > 0.2 is the
    * conventional "significant shift" threshold.
    */
  def psiNumeric(baseline: DataFrame, candidate: DataFrame,
                 cols: Seq[String], bins: Int = 10,
                 eps: Double = 1e-6): DataFrame = {
    val bounds = baseline.agg(
      cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c"))).head,
      cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c"))).tail: _*).head()

    def binned(df: DataFrame, side: String): DataFrame = {
      val stackArgs = cols.zipWithIndex.map { case (c, i) =>
        // all-null baseline column → no bounds → degenerate single bin
        val degenerate = bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)
        val lo = if (degenerate) 0.0 else bounds.getDouble(2 * i)
        val hi = if (degenerate) 0.0 else bounds.getDouble(2 * i + 1)
        val b =
          if (hi <= lo) "0L"
          else s"least(${bins - 1}L, greatest(0L, CAST(floor((CAST(`$c` AS DOUBLE) - $lo) / ${(hi - lo) / bins}) AS LONG)))"
        s"'$c', $b"
      }.mkString(", ")
      df.select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, bin)"))
        .where(col("bin").isNotNull) // null values carry no bin
        .groupBy("col_name", "bin").agg(count(lit(1)).as(s"n_$side"))
    }

    val a = binned(baseline, "base")
    val b = binned(candidate, "cand")
    val totals = a.groupBy("col_name").agg(sum("n_base").as("tot_base"))
      .join(b.groupBy("col_name").agg(sum("n_cand").as("tot_cand")), "col_name")
    a.join(b, Seq("col_name", "bin"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cand"))
      .join(totals, "col_name")
      .select(col("col_name"),
        ((col("n_base") / col("tot_base")) + eps).as("pa"),
        ((col("n_cand") / col("tot_cand")) + eps).as("pb"))
      .groupBy("col_name")
      .agg(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))).as("psi"))
      .select(col("col_name"), round(col("psi"), 6).as("psi"),
        (col("psi") > 0.2).as("drifted"))
  }

  /** Total-variation distance per categorical column:
    * 0.5 * Σ |p_base(v) - p_cand(v)| over the union of values.
    * Same single-scan stack() shape as [[psiNumeric]]. */
  def categoricalDrift(baseline: DataFrame, candidate: DataFrame,
                       cols: Seq[String]): DataFrame = {
    def freqs(df: DataFrame, side: String): DataFrame = {
      val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
      df.select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, val)"))
        .where(col("val").isNotNull)
        .groupBy("col_name", "val").agg(count(lit(1)).as(s"n_$side"))
    }
    val a = freqs(baseline, "base")
    val b = freqs(candidate, "cand")
    val totals = a.groupBy("col_name").agg(sum("n_base").as("tot_base"))
      .join(b.groupBy("col_name").agg(sum("n_cand").as("tot_cand")), "col_name")
    a.join(b, Seq("col_name", "val"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cand"))
      .join(totals, "col_name")
      .groupBy("col_name")
      .agg((sum(abs(col("n_base") / col("tot_base") - col("n_cand") / col("tot_cand"))) / 2)
        .as("tvd"))
      .select(col("col_name"), round(col("tvd"), 6).as("tvd"),
        (col("tvd") > 0.1).as("drifted"))
  }
}
