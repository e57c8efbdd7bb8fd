package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("id", "v")

  test("uncommitted batches are never visible; commit flips visibility atomically") {
    val table = java.nio.file.Files.createTempDirectory("graft-txtable").toString + "/t"

    CommitLog.writeBatch(rows(10, "a"), table, "r1", 0L)
    CommitLog.writeBatch(rows(20, "b"), table, "r1", 1L)
    assert(CommitLog.committedBatches(spark, table) == Seq(("r1", 0L), ("r1", 1L)))
    assert(CommitLog.readCommitted(spark, table).get.count() == 30)

    // crashed writer: data files land, marker never written
    rows(99, "crash").withColumn("run_id", lit("r1")).withColumn("batch_id", lit(2L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id").parquet(table)
    assert(CommitLog.readCommitted(spark, table).get.count() == 30,
      "torn batch visible through the log")
    // the legacy whole-table read has no such guarantee — the contrast
    assert(spark.read.parquet(table).count() == 129)

    // late commit makes exactly that batch visible
    CommitLog.commit(spark, table, "r1", 2L)
    assert(CommitLog.readCommitted(spark, table).get.count() == 129)

    // replay of a committed batch stays exactly-once
    CommitLog.writeBatch(rows(20, "b"), table, "r1", 1L)
    assert(CommitLog.readCommitted(spark, table).get.count() == 129)

    // partition columns survive the explicit-path read
    val df = CommitLog.readCommitted(spark, table).get
    assert(df.columns.toSet == Set("id", "v", "run_id", "batch_id"))
    assert(df.where(col("batch_id") === 2L).count() == 99)
  }

  test("empty log reads as None; second run's batches coexist") {
    val table = java.nio.file.Files.createTempDirectory("graft-txtable2").toString + "/t"
    assert(CommitLog.readCommitted(spark, table).isEmpty)
    CommitLog.writeBatch(rows(5, "x"), table, "r1", 0L)
    CommitLog.writeBatch(rows(7, "y"), table, "r2", 0L)
    assert(CommitLog.committedBatches(spark, table).toSet ==
      Set(("r1", 0L), ("r2", 0L)))
    assert(CommitLog.readCommitted(spark, table).get.count() == 12)
  }

  test("compactLog folds markers into a snapshot without changing the committed set") {
    val table = java.nio.file.Files.createTempDirectory("graft-txtable3").toString + "/t"
    for (b <- 0 until 5) CommitLog.writeBatch(rows(4, s"b$b"), table, "r1", b.toLong)
    val before = CommitLog.committedBatches(spark, table)
    CommitLog.compactLog(spark, table)
    assert(CommitLog.committedBatches(spark, table) == before)
    // exactly one snapshot file remains in the log
    val log = new java.io.File(s"$table/_commits").listFiles()
      .map(_.getName).filterNot(_.startsWith("."))
    assert(log.count(_.endsWith(".snapshot")) == 1 && !log.exists(_.endsWith(".commit")))
    // commits after compaction append alongside the snapshot
    CommitLog.writeBatch(rows(4, "b5"), table, "r1", 5L)
    assert(CommitLog.committedBatches(spark, table).length == 6)
    assert(CommitLog.readCommitted(spark, table).get.count() == 24)
  }

  test("vacuum removes only uncommitted partitions past the grace window") {
    val table = java.nio.file.Files.createTempDirectory("graft-txtable4").toString + "/t"
    CommitLog.writeBatch(rows(6, "keep"), table, "r1", 0L)
    rows(9, "orphan").withColumn("run_id", lit("r1")).withColumn("batch_id", lit(9L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id").parquet(table)
    // within grace: the orphan might be an in-flight writer — kept
    CommitLog.vacuum(spark, table, graceMs = 3600 * 1000)
    assert(new java.io.File(s"$table/run_id=r1/batch_id=9").exists())
    // past grace: reclaimed
    CommitLog.vacuum(spark, table, graceMs = 0L)
    assert(!new java.io.File(s"$table/run_id=r1/batch_id=9").exists())
    assert(new java.io.File(s"$table/run_id=r1/batch_id=0").exists())
    assert(CommitLog.readCommitted(spark, table).get.count() == 6)
  }

  test("racing reader only ever observes whole committed batches") {
    val table = java.nio.file.Files.createTempDirectory("graft-txtable5").toString + "/t"
    val batchRows = 50
    @volatile var writerDone = false
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val reader = new Thread(() => {
      while (!writerDone) {
        CommitLog.readCommitted(spark, table).foreach(df => observed.add(df.count()))
      }
    })
    reader.start()
    try {
      for (b <- 0 until 8)
        CommitLog.writeBatch(rows(batchRows, s"b$b"), table, "w", b.toLong)
    } finally { writerDone = true; reader.join(60000) }
    val counts = observed.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(counts.nonEmpty)
    // every observation is a whole number of batches, and monotone
    assert(counts.forall(c => c % batchRows == 0), s"torn read: ${counts.toSeq}")
    assert(counts.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(CommitLog.readCommitted(spark, table).get.count() == 8L * batchRows)
  }
}
