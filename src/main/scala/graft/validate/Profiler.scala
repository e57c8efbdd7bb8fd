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
}
