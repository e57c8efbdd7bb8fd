package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Demonstrates Spark's runtime Bloom-filter injection — the engine's
  * answer to "the filter is on the other side of the join": a
  * selective predicate on the build side is turned into a
  * bloom_filter/might_contain pre-filter on the probe side's scan, so
  * at 100 TB the fact table drops non-joining rows before the shuffle
  * instead of shuffling everything.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local test data is tiny — drop the size gates so the injection
      // logic itself is what's under test
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffled join

      val dir = "/root/testdata/sf0.001"
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT") // selective build side

      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$optimized")
      // and the result is still correct
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
  }
}
