package graft.streaming

import graft.SparkSpec
import graft.sources.CommitLog
import org.apache.spark.sql.functions._

/** The bare commit-log streaming sink must deliver exactly-once
  * across restarts, record marker stats, and compose with the
  * streaming SOURCE into a table-to-table relay. */
class CommitLogSinkSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once sink across restarts; stats recorded; table-to-table relay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clsink").toString
    val (drop, t1, t2) = (s"$dir/drop", s"$dir/t1", s"$dir/t2")

    def dropFiles(lo: Long, n: Int): Unit =
      (lo until lo + n).map(i => (i, s"v-$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(drop)
    def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try assert(q.awaitTermination(120000)) finally q.stop()

    dropFiles(0, 3)
    val schema = spark.read.parquet(drop).schema
    def sinkOnce(): Unit = drain(CommitLogSink.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(drop),
      t1, s"$dir/ckpt1", statsCols = Seq("id")))

    sinkOnce()
    assert(CommitLog.readCommitted(spark, t1).get.count() == 3)
    // marker stats landed: a range read prunes to one batch dir
    val stats = CommitLog.batchStats(spark, t1)
    assert(stats.nonEmpty && stats.values.forall(_.exists(_.col == "id")))

    // restart with new drops: ONLY the new rows arrive
    dropFiles(100, 2)
    sinkOnce()
    val rows = CommitLog.readCommitted(spark, t1).get
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(rows == ((0L until 3L) ++ (100L until 102L))
      .map(i => (i, s"v-$i")).toSet)
    // idle restart: nothing new, nothing doubled
    sinkOnce()
    assert(CommitLog.readCommitted(spark, t1).get.count() == 5)

    // relay: commit-log SOURCE → commit-log SINK, restart-safe
    def relayOnce(): Unit = drain(CommitLogSink.start(
      spark.readStream.format("graft_commitlog").load(t1),
      t2, s"$dir/ckpt2"))
    relayOnce()
    assert(CommitLog.readCommitted(spark, t2).get
      .select("id", "v").as[(Long, String)].collect().toSet == rows)
    // more upstream data flows through the relay exactly-once
    dropFiles(200, 1)
    sinkOnce(); relayOnce()
    assert(CommitLog.readCommitted(spark, t2).get
      .select("id", "v").as[(Long, String)].collect().toSet ==
      rows + ((200L, "v-200")))
  }

  test("an empty micro-batch commits nothing and never breaks the table") {
    // the r17 bug: an upstream filter dropping a whole epoch wrote no
    // partition directory but still committed a marker — every later
    // read of the table then failed with path-does-not-exist
    val dir = java.nio.file.Files.createTempDirectory("graft-clsink2").toString
    val (drop, table) = (s"$dir/drop", s"$dir/t")
    Seq((0L, "dropme")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(drop)
    Seq((1L, "keep-1")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(drop)
    val schema = spark.read.parquet(drop).schema
    // one file per trigger → the all-filtered file is an EMPTY epoch
    val q = CommitLogSink.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(drop).where(col("v").startsWith("keep")),
      table, s"$dir/ckpt", statsCols = Seq("id"))
    try assert(q.awaitTermination(120000)) finally q.stop()
    // the table must stay readable: exactly the surviving row, and no
    // dangling marker for the empty epoch
    val got = CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "keep-1")))
    assert(CommitLog.committedBatches(spark, table).size == 1,
      "the empty epoch must not commit a marker")
  }
}
