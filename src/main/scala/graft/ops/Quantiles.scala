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

  /** Per-group equal-frequency bucket assignment (the CCNet-style
    * head/middle/tail quality split: rank documents by a model score
    * WITHIN each language, cut into `n` bands). Exact form: one ntile
    * window per group — every group's rows funnel through one task's
    * sort, which is correct and oracle-replayable but only safe when
    * single groups fit a task (dimensions, per-language corpora up to
    * ~10⁸ rows). Ties broken by `idCol` so the cut is deterministic.
    * Ascending score order: bucket 1 = lowest scores (tail), bucket
    * `n` = highest (head). */
  def groupedBucketsExact(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, n: Int, bucketCol: String = "bucket"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(bucketCol, ntile(n).over(Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).asc, col(idCol).asc)))
  }

  /** Sketch form for fact-scale groups: one KLL sketch per group (map-
    * side mergeable partials — no per-group sort, no window), the tiny
    * (group → boundaries) frame broadcast back, assignment a narrow
    * when-chain over the boundary array. Bucket edges are approximate
    * (KLL rank error), which is the accepted trade for never sorting
    * 100 TB; boundary semantics match [[bucketize]] (value ≤ bound i →
    * bucket i+1). */
  def groupedBucketsSketch(df: DataFrame, groupCol: String,
      scoreCol: String, n: Int, bucketCol: String = "bucket",
      k: Int = 200): DataFrame = {
    val probs = (1 until n).map(_.toDouble / n)
    val bounds = df.groupBy(groupCol).agg(
      graft.expr.KllSketch.kllQuantiles(col(scoreCol), probs, k).as("bs"))
    val c = col(scoreCol)
    val assigned = (0 until n - 1).foldRight(lit(n): Column) {
      case (i, acc) => when(c <= element_at(col("bs"), i + 1), lit(i + 1))
        .otherwise(acc)
    }
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(bucketCol, when(c.isNull, lit(null)).otherwise(assigned))
      .drop("bs")
  }
}
