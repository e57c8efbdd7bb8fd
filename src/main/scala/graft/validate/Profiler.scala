package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics in ONE pass over the data —
  * the "what does this feed look like" companion to the rule engine
  * (the reference eyeballs generated files by loading them in pandas;
  * at 100 TB profiling must be a single distributed aggregate, never a
  * per-column loop of scans).
  *
  * Implementation: one wide aggregate row (4 aggregates per column,
  * partial-aggregated map-side) followed by a driver-side unpivot of
  * that single row into (column, stats) rows — the unpivot touches
  * one row, so it costs nothing at any scale.
  *
  * `exactDistinct = false` (default) uses HyperLogLog
  * (approx_count_distinct) — one pass, mergeable, what you want on a
  * cluster. `true` uses exact count(DISTINCT) — Catalyst expands
  * multiple exact distincts with per-distinct shuffles; only for
  * small/verification runs (the DuckDB oracle uses this mode).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exactDistinct: Boolean = false): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = targets.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    // unpivot the single wide row with stack(): n_rows is replicated
    // into every output row, so the result is self-contained
    val stackArgs = targets.map { c =>
      s"'$c', `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    // "col_name", not "column": the latter is a reserved word in
    // several engines (incl. DuckDB), which would force quoting in
    // downstream SQL over the report
    wide.select(col("__total").as("n_rows"),
        expr(s"stack(${targets.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * pass — the redundancy/drift companion to [[profile]]: a feature
    * pair whose correlation jumps between snapshots signals a broken
    * join or a duplicated signal, and at 100 TB "compute corr(a,b)
    * for all pairs" must be one wide aggregate, never a per-pair scan
    * loop (p·(p−1)/2 · 6 partial-aggregated sums ride one shuffle
    * row).
    *
    * Engine-reproducible: each value is quantized to `floor(v·quant)`
    * BIGINT first, per-row products stay in Long range (caller keeps
    * |v·quant| under ~3e9), and the accumulators are DECIMAL(38,0) —
    * exact and order-independent like DuckDB's HUGEINT sums — so both
    * engines reach identical integers; the closing Pearson expression
    * is one pinned double chain (num / (sqrt(dx)·sqrt(dy)), floored
    * to 10⁻⁶). Pairs with a constant side yield NULL.
    *
    * Null semantics: each pair uses exactly the rows where BOTH
    * columns are non-null (pairwise deletion). */
  def correlations(df: DataFrame, cols: Seq[String],
      quant: Long = 100L): DataFrame = {
    require(cols.size >= 2, "correlations needs >= 2 columns")
    require(quant >= 1, s"quant $quant must be >= 1")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def q(c: String) = floor(col(c).cast("double") * quant).cast("long")
    val dec = "decimal(38,0)"
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val cond = col(a).isNotNull && col(b).isNotNull
      val (x, y) = (q(a), q(b))
      Seq(
        sum(when(cond, lit(1L))).as(s"n_$k"),
        sum(when(cond, x).cast(dec)).as(s"sx_$k"),
        sum(when(cond, y).cast(dec)).as(s"sy_$k"),
        sum(when(cond, x * x).cast(dec)).as(s"sxx_$k"),
        sum(when(cond, y * y).cast(dec)).as(s"syy_$k"),
        sum(when(cond, x * y).cast(dec)).as(s"sxy_$k"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), k) =>
      val n = col(s"n_$k")
      val num = (n * col(s"sxy_$k") - col(s"sx_$k") * col(s"sy_$k"))
        .cast("double")
      val dx = n * col(s"sxx_$k") - col(s"sx_$k") * col(s"sx_$k")
      val dy = n * col(s"syy_$k") - col(s"sy_$k") * col(s"sy_$k")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        coalesce(n, lit(0L)).as("n_pairs"),
        when(dx > lit(0) && dy > lit(0),
          floor(num / (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))
            * 1000000) / 1000000).as("corr"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-column skewness and excess kurtosis — the shape row the
    * min/max/mean/std profile misses: a long right tail (positive
    * skew) says "quantile-cap before averaging", heavy tails (high
    * kurtosis) say "expect stragglers on this join key". Population
    * moments over values floor-quantized by `quant` (like
    * [[correlations]]): the four power sums Σq..Σq⁴ are exact
    * DECIMAL(38,0) integers on ONE wide aggregate for all columns;
    * the central-moment closing runs as one pinned double chain per
    * column (deterministic: a fixed expression tree over exact
    * operands, with sqrt — correctly rounded IEEE — rather than pow).
    * Skew/kurtosis NULL on (near-)constant columns (m2 quantizes to
    * 0). Keep quant·|v| ≲ 10⁷ so the q⁴ sum (10²⁸ per row) stays
    * inside 38 digits at 10⁹⁺ row counts. Output one row per column:
    * (col_name, n, mean, skewness, kurtosis). */
  def moments(df: DataFrame, cols: Seq[String],
      quant: Long = 100L): DataFrame = {
    require(cols.nonEmpty, "moments needs >= 1 column")
    require(quant >= 1, s"quant $quant must be >= 1")
    val dec = "decimal(38,0)"
    def q(c: String) = floor(col(c).cast("double") * quant).cast("long")
    val aggs = cols.zipWithIndex.flatMap { case (c, k) =>
      val x = q(c)
      Seq(
        sum(when(col(c).isNotNull, lit(1L))).as(s"n_$k"),
        sum(x.cast(dec)).as(s"s1_$k"),
        // x² fits a long at q <= 1e8; x³/x⁴ must grow in DECIMAL
        sum((x * x).cast(dec)).as(s"s2_$k"),
        sum((x * x).cast(dec) * x).as(s"s3_$k"),
        sum((x * x).cast(dec) * (x * x).cast(dec)).as(s"s4_$k"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, k) =>
      val n = col(s"n_$k").cast("double")
      val s1 = col(s"s1_$k").cast("double")
      val s2 = col(s"s2_$k").cast("double")
      val s3 = col(s"s3_$k").cast("double")
      val s4 = col(s"s4_$k").cast("double")
      val m1 = s1 / n
      val m2 = s2 / n - m1 * m1
      val m3 = s3 / n - lit(3.0) * m1 * (s2 / n) + lit(2.0) * m1 * m1 * m1
      val m4 = s4 / n - lit(4.0) * m1 * (s3 / n) +
        lit(6.0) * m1 * m1 * (s2 / n) - lit(3.0) * m1 * m1 * m1 * m1
      struct(
        lit(c).as("col_name"),
        col(s"n_$k").as("n"),
        (floor(m1 / quant * 1000000) / 1000000).as("mean"),
        when(m2 > 0,
          floor(m3 / (m2 * sqrt(m2)) * 1000000) / 1000000).as("skewness"),
        when(m2 > 0,
          floor((m4 / (m2 * m2) - lit(3.0)) * 1000000) / 1000000)
          .as("kurtosis"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Per-column Shannon entropy (nats) over the value distribution —
    * the key-detection / drift companion to [[profile]]: entropy near
    * ln(n) flags a key column, entropy near 0 a constant, and an
    * entropy shift between snapshots is distribution drift that
    * min/max/distinct miss. ALL columns ride ONE shuffle: the frame is
    * unpivoted to (col_name, value) rows first, so the value histogram
    * for every column is a single groupBy — never a per-column scan
    * loop.
    *
    * Engine-reproducible: H = ln(n) − Σ cnt·ln(cnt) / n is computed
    * with the per-value terms integer-quantized to
    * `cnt · round(ln(cnt)·10⁶)` BIGINTs, accumulated in DECIMAL(38,0)
    * (order-independent, = DuckDB HUGEINT), and one pinned closing
    * double chain floored to 10⁻⁶. Values hash on their STRING form —
    * callers pass string/integer columns (float formatting is not
    * cross-engine stable).
    *
    * Null semantics: nulls are excluded from the distribution (a
    * column's n is its non-null count; an all-null column is absent).
    */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "entropy needs >= 1 column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("val"))): _*))
        .as("s"))
      .select(col("s.col_name"), col("s.val"))
      .where(col("val").isNotNull)
    val hist = stacked.groupBy("col_name", "val")
      .agg(count(lit(1)).as("cnt"))
    hist.groupBy("col_name")
      .agg(sum("cnt").as("n_nonnull"),
        count(lit(1)).as("n_distinct"),
        sum((col("cnt") * round(log(col("cnt").cast("double")) * 1000000)
          .cast("long")).cast("decimal(38,0)")).as("s_terms"))
      .select(col("col_name"), col("n_nonnull"), col("n_distinct"),
        (floor((log(col("n_nonnull").cast("double")) -
          col("s_terms").cast("double") /
            col("n_nonnull").cast("double") / 1000000.0) * 1000000)
          / 1000000).as("entropy_nats"))
  }
}
