package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins and aggregations.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers
  * sort-merge joins at runtime; explicit salting is still the tool of
  * choice when one side must be replicated (broadcast-unfriendly
  * medium dim joined on a power-law key) or when a groupBy key is
  * pathological. Both operators here are pure DataFrame transforms.
  *
  * The salt is derived from ROW CONTENT (xxhash64 over all columns),
  * never from `monotonically_increasing_id()` or `rand()`: the salt
  * feeds a shuffle key, and a non-deterministic salt recomputed after
  * a lost-executor retry would route rows to different salt partitions
  * than the surviving shuffle files — double-counting or dropping rows
  * downstream. Content-derived salt is stable under any re-execution;
  * identical duplicate rows share a salt (slightly less spread on
  * duplicate-heavy data), which trades a little balance for exactly
  * the determinism retries require.
  */
object Skew {

  /** Deterministic salt in [0, factor) from the full row content.
    * Requires hashable column types (xxhash64 rejects MapType) — for
    * frames with maps, pass a projection of hashable columns. */
  private def contentSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(factor)).cast("int")

  /** Salted inner equi-join: the skewed (big) side gets a
    * content-derived salt in [0, factor); the other side is replicated
    * across all salts via explode. Turns one hot key's single reducer
    * into `factor` parallel reducers at the cost of replicating the
    * right side `factor`×. Use when the right side is too big to
    * broadcast but small enough to replicate.
    */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", contentSalt(big, factor))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with salt: groupBy
    * (key, salt) first, then re-aggregate by key. For aggregates that
    * re-combine associatively (sum/count/min/max), this bounds any
    * single reducer's input to rows/factor even under a single
    * dominant key. Spark's hash aggregate already does map-side
    * partials; explicit salting matters when a single key's map-side
    * partials still overwhelm one reducer (e.g., high-cardinality
    * payloads per key such as collect-style aggs). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                factor: Int = 8): DataFrame =
    df.withColumn("__salt", contentSalt(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
