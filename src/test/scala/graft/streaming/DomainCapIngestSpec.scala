package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DomainCapIngestSpec extends SparkSpec {
  import spark.implicits._

  private def urls(rows: (Long, String)*) = rows.toDF("doc_id", "url")

  test("run-level domain cap: admissions accumulate across batches up to cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-domcap").toString
    val (acc, st) = (s"$dir/accepted", s"$dir/state")

    // batch 0: 4 docs on hot.com (cap 3) + 1 on other.org
    DomainCapIngest.processBatch(
      urls((1L, "https://a.hot.com/1"), (2L, "https://b.hot.com/2"),
        (3L, "https://hot.com/3"), (4L, "https://c.hot.com/4"),
        (5L, "https://other.org/x")),
      "doc_id", "url", acc, st, "r", 0L, cap = 3)
    val b0 = spark.read.parquet(acc)
    assert(b0.where(col("domain") === "hot.com").count() == 3)
    assert(b0.where(col("domain") === "other.org").count() == 1)

    // batch 1: hot.com is exhausted — nothing more admitted; other.org
    // has 2 slots left, admits both
    DomainCapIngest.processBatch(
      urls((10L, "https://hot.com/5"), (11L, "https://d.hot.com/6"),
        (12L, "https://other.org/y"), (13L, "https://www.other.org/z")),
      "doc_id", "url", acc, st, "r", 1L, cap = 3)
    val all = spark.read.parquet(acc)
    assert(all.where(col("domain") === "hot.com").count() == 3)
    assert(all.where(col("domain") === "other.org").count() == 3)
    // the state ledger certifies the same totals
    val ledger = spark.read.parquet(st).groupBy("domain")
      .agg(sum("admitted").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger == Map("hot.com" -> 3L, "other.org" -> 3L))
  }

  test("a retried batch re-derives identical admissions after its state commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-domcap-r").toString
    val (acc, st) = (s"$dir/accepted", s"$dir/state")
    DomainCapIngest.processBatch(
      urls((1L, "https://hot.com/1"), (2L, "https://a.hot.com/2")),
      "doc_id", "url", acc, st, "r", 0L, cap = 3)
    val b1 = urls((10L, "https://hot.com/3"), (11L, "https://b.hot.com/4"),
      (12L, "https://c.hot.com/5"))
    DomainCapIngest.processBatch(b1, "doc_id", "url", acc, st, "r", 1L, cap = 3)
    val first = spark.read.parquet(acc).select("doc_id")
      .as[Long].collect().toSet
    // retry batch 1 AFTER its state commit: without the own-partition
    // exclusion the ledger would read 3 admitted and the retry would
    // admit nothing, silently shrinking the corpus
    DomainCapIngest.processBatch(b1, "doc_id", "url", acc, st, "r", 1L, cap = 3)
    val second = spark.read.parquet(acc).select("doc_id")
      .as[Long].collect().toSet
    assert(second == first, s"retry changed admissions: $second vs $first")
    assert(spark.read.parquet(st).groupBy().agg(sum("admitted")).head().getLong(0) == 3L)
  }

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-domcap-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    (0 until 8).map(i => (i.toLong, s"https://www.hot.com/p/$i"))
      .toDF("doc_id", "url").write.mode("append").parquet(drop)
    val stream = spark.readStream.schema("doc_id BIGINT, url STRING").parquet(drop)
    val q = DomainCapIngest.start(stream, "doc_id", "url",
      s"$dir/accepted", s"$dir/state", s"$dir/ckpt", cap = 5)
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.read.parquet(s"$dir/accepted").count() == 5)
    // deterministic content-keyed selection: the batch shape of the
    // same rank (perDomainCap) must agree on the winner set
    val batchWinners = graft.text.UrlOps.perDomainCap(
        (0 until 8).map(i => (i.toLong, s"https://www.hot.com/p/$i"))
          .toDF("doc_id", "url"), "doc_id", "url", cap = 5)
      .select("doc_id").as[Long].collect().toSet
    val kept = spark.read.parquet(s"$dir/accepted").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == batchWinners)
  }
}
