package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit (Sweeney 2002) — the privacy gate a
  * training-data release runs over its METADATA: a row is k-anonymous
  * when at least k−1 other rows share its quasi-identifier
  * combination (zip+age+gender re-identifies most people; the same
  * failure shape lives in doc metadata like domain+date+author). The
  * audit reports which combinations are under-populated and how much
  * of the corpus they expose; the enforcement form suppresses or
  * survives rows accordingly.
  *
  * Scale shape: one counting groupBy on the quasi-identifier tuple
  * (map-side partials), and for enforcement one shuffled semi/anti
  * join back on the same key — no window, no collect; the report
  * frame is combinations-sized, the summary is one row. */
object Anonymity {

  /** Under-populated combinations: one row per quasi-identifier tuple
    * with fewer than k rows — (quasi cols..., n). */
  def riskyGroups(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** One-row audit summary: total rows, rows in under-k groups, the
    * exposed fraction (floor-quantized to 6), and the corpus's actual
    * anonymity level (the SMALLEST group size — the k the data
    * satisfies). */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "no quasi-identifier columns")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(sum("n").as("total_rows"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).as("exposed_rows"),
        min("n").as("min_group"),
        count(lit(1)).as("n_groups"),
        coalesce(sum((col("n") < k).cast("long")), lit(0L)).as("risky_groups"))
      .select(col("total_rows"), col("exposed_rows"),
        when(col("total_rows") > 0,
          floor(col("exposed_rows").cast("double") / col("total_rows") * 1e6) / 1e6)
          .as("exposed_frac"),
        col("min_group").as("achieved_k"), col("n_groups"), col("risky_groups"))
  }

  /** Enforcement: drop every row whose quasi-identifier combination
    * has fewer than k rows (suppression — the release then IS
    * k-anonymous on those columns). Plain anti join, NOT broadcast:
    * the risky frame is corpus-sized in the worst case (every row
    * unique on the quasi columns); AQE picks broadcast when it is in
    * fact small. */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.join(riskyGroups(df, quasiCols, k).select(quasiCols.map(col): _*),
      quasiCols, "left_anti")
}
