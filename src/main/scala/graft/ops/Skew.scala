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
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side gets a random salt
    * in [0, factor); the other side is replicated across all salts via
    * explode. Turns one hot key's single reducer into `factor`
    * parallel reducers at the cost of replicating the right side
    * `factor`×. Use when the right side is too big to broadcast but
    * small enough to replicate.
    */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
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
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
