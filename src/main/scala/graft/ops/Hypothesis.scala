package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests — the decision layer on top of the
  * profiling/drift/bootstrap statistics: "is segment A's metric
  * actually different from B's, or is it noise". Both tests are
  * engine-reproducible: every sufficient statistic is an exact
  * integer aggregate (caller-quantized values, histogram ranks), and
  * the closing test statistic is one pinned double chain over exact
  * integers.
  *
  * Scale shape: Welch is one grouped aggregate; Mann-Whitney builds
  * the rank sums from a VALUE HISTOGRAM cumulative (the ECOD trick) —
  * ties get exact average ranks via doubled-rank integers, never a
  * corpus-wide sort. */
object Hypothesis {

  /** Welch's unequal-variance z-test for the difference of means of
    * `valueCol` (integral) between rows where `groupCol` is true and
    * the rest. Output one row: `(n_a, n_b, mean_a, mean_b, z)` —
    * means and z floored to 10⁻⁶; z NULL when either side is
    * degenerate (n < 2 or both variances zero). */
  def welchZ(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = df.select(col(groupCol).cast("boolean").as("a"),
        col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("a").isNotNull)
      .groupBy("a")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("sx"),
        sum((col("v") * col("v")).cast(dec)).as("sxx"))
    val wide = g.agg(
      max(when(col("a"), col("n"))).as("na"),
      max(when(col("a"), col("sx"))).as("sxa"),
      max(when(col("a"), col("sxx"))).as("sxxa"),
      max(when(!col("a"), col("n"))).as("nb"),
      max(when(!col("a"), col("sx"))).as("sxb"),
      max(when(!col("a"), col("sxx"))).as("sxxb"))
    def mean(sx: String, n: String) =
      col(sx).cast("double") / col(n).cast("double")
    def varOf(n: String, sx: String, sxx: String) =
      (col(n) * col(sxx) - col(sx) * col(sx)).cast("double") /
        (col(n).cast("double") * (col(n) - 1).cast("double"))
    val va = varOf("na", "sxa", "sxxa"); val vb = varOf("nb", "sxb", "sxxb")
    val se2 = va / col("na").cast("double") + vb / col("nb").cast("double")
    wide.select(col("na").as("n_a"), col("nb").as("n_b"),
      (floor(mean("sxa", "na") * 1000000) / 1000000).as("mean_a"),
      (floor(mean("sxb", "nb") * 1000000) / 1000000).as("mean_b"),
      when(col("na") >= 2 && col("nb") >= 2 && se2 > 0,
        floor((mean("sxa", "na") - mean("sxb", "nb")) / sqrt(se2)
          * 1000000) / 1000000).as("z"))
  }

  /** Mann-Whitney U (normal approximation, tie-corrected) comparing
    * `valueCol` between `groupCol`=true (side A) and the rest.
    * Doubled ranks keep tie-averaged ranks integral:
    * `dr(v) = 2·#{x < v} + #{x = v} + 1`, so `2·R_A = Σ dr` over A is
    * exact, `u2 = 2·U_A = 2R_A − n_a(n_a+1)` is the exact doubled
    * statistic, and the tie-corrected z closes in one pinned chain.
    * Output: `(n_a, n_b, u2, z)` — z NULL when a side is empty or
    * every value ties. */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rows = df.select(col(groupCol).cast("boolean").as("a"),
        col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("a").isNotNull)
    val hist = rows.groupBy("v")
      .agg(count(lit(1)).as("t"),
        sum(when(col("a"), 1L).otherwise(0L)).as("ta"))
    val w = Window.orderBy("v")
    val cum = hist.withColumn("cle", sum("t").over(w))
      .select(col("v"), col("t"), col("ta"),
        (lit(2) * (col("cle") - col("t")) + col("t") + 1).as("dr"),
        // t³−t in DECIMAL(38,0) from the first multiply: a BIGINT t³
        // overflows at t ≈ 2.1M ties — easy for quantized corpus
        // metrics — and would throw (ANSI) or silently wrap.
        (col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec)
          - col("t").cast(dec)).as("tc"))
    val agg = cum.agg(
      sum(col("ta")).as("na"), sum(col("t") - col("ta")).as("nb"),
      sum(col("ta").cast(dec) * col("dr").cast(dec)).as("dra"),
      sum(col("tc")).as("ties"))
    val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
    val n = col("na") + col("nb")
    val nD = naD + nbD
    val u2 = (col("dra") - col("na").cast(dec) * (col("na") + 1)).cast("long")
    // var(U) = na·nb/12 · ((n+1) − Σ(t³−t)/(n(n−1))); z uses the
    // doubled U: z = (2U − na·nb) / (2·sqrt(var))
    val varU = naD * nbD / 12.0 *
      ((nD + 1) - col("ties").cast("double") / (nD * (nD - 1)))
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      u2.as("u2"),
      when(col("na") >= 1 && col("nb") >= 1 && varU > 0,
        floor((u2.cast("double") - naD * nbD) / (lit(2.0) * sqrt(varU))
          * 1000000) / 1000000).as("z"))
  }

  /** Chi-squared test of independence between two categorical
    * columns, plus Cramér's V effect size. Per-cell contributions use
    * the integer-exact form `(o·n − r·c)² / (n·r·c)` quantized to
    * 10⁻⁹ BIGINTs BEFORE summing (a raw double sum would be
    * order-sensitive across cells), so chi2 is bit-stable; V closes
    * in one pinned chain. Output one row:
    * `(n, n_rows_cat, n_cols_cat, dof, chi2_9, cramers_v)`. */
  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val withMargins = cells
      .withColumn("r", sum("o").over(
        org.apache.spark.sql.expressions.Window.partitionBy("a")))
      .withColumn("c", sum("o").over(
        org.apache.spark.sql.expressions.Window.partitionBy("b")))
      .withColumn("n", sum("o").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val num = (col("o") * col("n") - col("r") * col("c")).cast(dec)
    // Denominator n·r·c multiplies in DOUBLE: the raw Long product
    // exceeds 2^63 once n·r·c > 9.2e18 (n ~ 2M with balanced margins).
    val contrib9 = round((num * num).cast("double") /
      (col("n").cast("double") * col("r").cast("double") *
        col("c").cast("double")) * 1000000000L)
      .cast("long")
    withMargins
      .withColumn("c9", contrib9)
      .agg(max("n").as("n"),
        countDistinct("a").as("n_rows_cat"),
        countDistinct("b").as("n_cols_cat"),
        sum("c9").as("chi2_9"))
      .select(col("n"), col("n_rows_cat"), col("n_cols_cat"),
        ((col("n_rows_cat") - 1) * (col("n_cols_cat") - 1)).as("dof"),
        col("chi2_9"),
        when(col("n_rows_cat") >= 2 && col("n_cols_cat") >= 2,
          floor(sqrt(col("chi2_9").cast("double") / 1000000000.0 /
            (col("n") * least(col("n_rows_cat") - 1,
              col("n_cols_cat") - 1)).cast("double")) * 1000000)
            / 1000000).as("cramers_v"))
  }

  /** Kruskal-Wallis H — the k-group generalization of
    * [[mannWhitney]]: does `valueCol` have the same distribution
    * across ALL levels of `groupCol`, rank-based so outliers and
    * non-normality don't poison it. Ranks come from the VALUE
    * HISTOGRAM like the two-group form (doubled mid-ranks
    * 2·below + t + 1 stay integral; no corpus sort), per-group
    * doubled-rank sums are exact DECIMAL(38,0), the tie correction
    * Σ(t³−t)/(N³−N) is exact, and the per-group R²/n terms are
    * quantized on a fixed 10⁻¹² grid RELATIVE TO N³ (their natural
    * scale) before the k-row sum — deterministic in any order, and
    * the engine-replay computes the identical grid. Group cardinality
    * k is assumed vocabulary-bounded (segments, languages, sources).
    * Output one row: `(n, k, h)` — h tie-corrected, floored to 10⁻⁶,
    * NULL when every value ties (correction hits 0) or k < 2. */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rows = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("g").isNotNull)
    val byVal = rows.groupBy("v").agg(count(lit(1)).as("t"))
    val w = Window.orderBy("v")
    val ranked = byVal.withColumn("cle", sum("t").over(w))
      .select(col("v"),
        (lit(2) * (col("cle") - col("t")) + col("t") + 1).as("dr"),
        // Same DECIMAL-first t³−t as mannWhitney: BIGINT wraps at
        // ~2.1M ties per value.
        (col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec)
          - col("t").cast(dec)).as("tc"))
    val perGroup = rows.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .join(ranked.select("v", "dr"), "v")
      .groupBy("g")
      .agg(sum("c").as("ng"),
        sum(col("c").cast(dec) * col("dr").cast(dec)).as("r2"))
    val ties = ranked.agg(sum("tc").as("ties"))
    val nTot = perGroup.agg(sum("ng").as("n"), count(lit(1)).as("k"))
    val terms = perGroup.crossJoin(broadcast(nTot))
      .select(col("n"), col("k"),
        floor(col("r2").cast("double") * col("r2").cast("double")
          / col("ng") / col("n") / col("n") / col("n")
          * 1000000000000L).cast("long").as("t12"))
      .groupBy("n", "k").agg(sum("t12").as("s12"))
    val nD = col("n").cast("double")
    val hRaw = lit(3.0) * nD * nD * nD *
      (col("s12").cast("double") / 1e12) / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - col("ties").cast("double") /
      (nD * nD * nD - nD)
    terms.crossJoin(broadcast(ties))
      .select(col("n"), col("k").cast("long").as("k"),
        when(col("k") >= 2 && corr > 0,
          floor(hRaw / corr * 1000000) / 1000000).as("h"))
  }

}
