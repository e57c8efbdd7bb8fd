package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: writing both join sides bucketed by the
  * join key lets the sort-merge join run with ZERO exchanges — the
  * pre-shuffled layout is the standard answer to repeated fact-fact
  * joins at warehouse scale (pay the shuffle once at write time). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without Exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // a stale managed-table dir survives metastore resets and blocks
    // CREATE TABLE — clear the physical locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lines").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }

    val orders = spark.range(1000).select(col("id").as("orderkey"),
      (col("id") % 97).as("custkey"))
    val lines = spark.range(4000).select((col("id") % 1000).as("orderkey"),
      (col("id") % 50 + 1).cast("double").as("qty"))

    orders.write.bucketBy(8, "orderkey").sortBy("orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lines.write.bucketBy(8, "orderkey").sortBy("orderkey")
      .mode("overwrite").saveAsTable("b_lines")

    // disable auto-broadcast: at real scale neither fact side fits in
    // memory — the point is the shuffle-free sort-merge over buckets
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) = try {
      val j = spark.table("b_lines").join(spark.table("b_orders"), "orderkey")
        .groupBy("custkey").agg(sum("qty").as("total"))
      (j, j.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join itself must consume the bucketed layout directly: no
    // shuffle between the scans and the join
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      s"expected a join over bucketed scans in:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join should not shuffle, plan:\n$plan")

    // and it computes the right numbers
    val total = joined.agg(sum("total")).as[Double].head()
    val expected = lines.join(orders, "orderkey").agg(sum("qty")).as[Double].head()
    assert(total == expected)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }
}
