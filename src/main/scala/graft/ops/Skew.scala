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

  /** Deterministic salt in [0, factor). Hashes `uniqueCol` when given
    * (a stable unique id — e.g. a source-generated event id — spreads
    * even byte-identical duplicate rows), else the full row content,
    * skipping MapType columns (xxhash64 rejects maps). Fully-duplicate
    * rows share a salt in content mode — the price of retry
    * determinism; supply `uniqueCol` when the data has one. */
  private def contentSalt(df: DataFrame, factor: Int,
                          uniqueCol: Option[String]): Column = {
    val basis = uniqueCol match {
      case Some(c) => Seq(col(c))
      case None => df.schema.fields
        .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(f => col(f.name)).toSeq
    }
    pmod(xxhash64(basis: _*), lit(factor)).cast("int")
  }

  /** Salted inner equi-join: the skewed (big) side gets a
    * content-derived salt in [0, factor); the other side is replicated
    * across all salts via explode. Turns one hot key's single reducer
    * into `factor` parallel reducers at the cost of replicating the
    * right side `factor`×. Use when the right side is too big to
    * broadcast but small enough to replicate.
    */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 factor: Int = 8, uniqueCol: Option[String] = None): DataFrame = {
    val saltedBig = big.withColumn("__salt", contentSalt(big, factor, uniqueCol))
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
                factor: Int = 8, uniqueCol: Option[String] = None): DataFrame =
    df.withColumn("__salt", contentSalt(df, factor, uniqueCol))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
