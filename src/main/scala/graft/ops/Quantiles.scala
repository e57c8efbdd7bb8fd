package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact-scale quantile bucketing — the scale path that q_decile_acctbal's
  * ntile() form can't take: a global ntile window funnels every row
  * through ONE task, which is fine for a dimension and fatal for a
  * 100 TB fact. Here the boundaries come from approxQuantile
  * (Greenwald-Khanna, one distributed pass, mergeable partials; the
  * driver receives only n-1 doubles) and assignment is a narrow
  * codegen'd when-chain — no sort, no shuffle, no window.
  */
object Quantiles {

  /** Boundary values for `n` equal-frequency buckets of `colName`.
    * relativeError = 0 computes exact quantiles (still one pass). */
  def boundaries(df: DataFrame, colName: String, n: Int,
                 relativeError: Double = 1e-3): Array[Double] =
    df.stat.approxQuantile(colName, (1 until n).map(_.toDouble / n).toArray,
      relativeError)

  /** Adds `bucketCol` (1..n) assigning each row to its quantile bucket.
    * Rows with NULL in `colName` get NULL. */
  def bucketize(df: DataFrame, colName: String, n: Int,
                bucketCol: String = "bucket",
                relativeError: Double = 1e-3): DataFrame = {
    val bs = boundaries(df, colName, n, relativeError)
    val c = col(colName)
    val assigned = bs.zipWithIndex.foldRight(lit(n): Column) {
      case ((b, i), acc) => when(c <= b, lit(i + 1)).otherwise(acc)
    }
    df.withColumn(bucketCol, when(c.isNull, lit(null)).otherwise(assigned))
  }
}
