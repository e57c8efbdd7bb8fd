package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-join cardinality estimation from KMV bottom-k sketches — the
  * planner guardrail a 100 TB pipeline wants BEFORE committing to a
  * shuffle: sketch both key sets in one narrow pass each (a top-k of
  * hashes, no shuffle of the full key domain), then estimate the
  * distinct-key overlap from the union sketch (Beyer et al. 2007,
  * "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations"): with h_k the k-th smallest hash of A∪B and x the
  * number of those k that occur in BOTH sides, Jaccard ≈ x/k and
  * |A∪B| ≈ (k−1)·2⁶⁰/h_k, so |A∩B| ≈ (x/k)·(k−1)·2⁶⁰/h_k. When the
  * union has fewer than k distinct hashes the sketch IS the union and
  * x is exact.
  *
  * Hashing is the repo's md5 60-bit fold, so any engine replays the
  * estimate bit-for-bit; the closing arithmetic is a pinned
  * double-precision expression tree (integer inputs, one rounding
  * chain). Mis-estimation risk is the standard KMV ±O(1/√k) relative
  * error on the union, scaled by the Jaccard ratio.
  *
  * Scale shape: per side, a distinct on the (narrow) hashed key then
  * a TakeOrdered(k) — partial top-k per partition, k rows to the
  * driver-side reduce, never a global sort; the estimate itself is a
  * k-row frame joined to two k-row semi-marks.
  */
object JoinEstimate {

  private def md5Fold60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** One-row estimate of the distinct-key overlap of `a.aCol` and
    * `b.bCol`. Output: `(k_used, x_both, h_k, est_intersection)` —
    * `k_used` = sketch rows actually available (< k means exact),
    * `x_both` = sketch hashes present in both sides,
    * `est_intersection` = floored KMV estimate (exact when the union
    * fit in the sketch). */
  def overlap(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    val ha = a.select(md5Fold60(col(aCol)).as("h")).where(col("h").isNotNull)
      .distinct()
    val hb = b.select(md5Fold60(col(bCol)).as("h")).where(col("h").isNotNull)
      .distinct()
    val sketch = ha.union(hb).distinct().orderBy("h").limit(k)
    val marked = sketch
      .join(ha.withColumn("ina", lit(1)), Seq("h"), "left")
      .join(hb.withColumn("inb", lit(1)), Seq("h"), "left")
    marked.agg(
        count(lit(1)).as("k_used"),
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
          .otherwise(0L)).as("x_both"),
        max(col("h")).as("h_k"))
      .select(col("k_used"), col("x_both"), col("h_k"),
        when(col("k_used") < k, col("x_both"))
          .otherwise(floor(
            col("x_both").cast("double") *
              (col("k_used") - 1).cast("double") *
              (lit(1152921504606846976.0) / col("h_k").cast("double")) /
              col("k_used").cast("double")).cast("long"))
          .as("est_intersection"))
  }
}
