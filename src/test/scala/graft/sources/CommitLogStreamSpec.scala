package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft_commitlog")` must tail the committed
  * append log exactly-once across restarts, keep torn batches
  * invisible, never re-deliver copy-on-write rewrites of batches it
  * already streamed, deliver each chain's live member on a fresh
  * start, and fail loudly on un-compacted deletes. */
class CommitLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Long, n: Int, tag: String) =
    (0 until n).map(i => (lo + i, s"$tag-$i")).toDF("id", "v")

  private def drain(table: String, checkpoint: String, sink: String,
      ignoreDeletes: Boolean = false): Unit = {
    val reader = spark.readStream.format("graft_commitlog")
    val q = (if (ignoreDeletes) reader.option("ignoreDeletes", "true") else reader)
      .load(table)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
  }

  private def sunk(sink: String): Set[(Long, String)] =
    spark.read.parquet(sink).select("id", "v")
      .as[(Long, String)].collect().toSet

  test("tail the committed log exactly-once across restarts; torn batches invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatch(rows(0, 5, "a"), table, "r1", 0L, ts = 1000L)
    CommitLog.writeBatch(rows(10, 5, "b"), table, "r1", 1L, ts = 2000L)
    // torn batch: data files without a marker must never stream
    rows(900, 9, "torn").withColumn("run_id", lit("r9")).withColumn("batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id").parquet(table)

    drain(table, ckpt, sink)
    assert(sunk(sink) == (rows(0, 5, "a").union(rows(10, 5, "b")))
      .as[(Long, String)].collect().toSet)

    // restart with new appends: ONLY the new batch arrives
    CommitLog.writeBatch(rows(20, 5, "c"), table, "r1", 2L, ts = 3000L)
    CommitLog.commit(spark, table, "r9", 0L) // the torn batch commits late
    drain(table, ckpt, sink)
    val all = sunk(sink)
    assert(all.count(_._2.startsWith("a")) == 5, "batch a must not re-stream")
    assert(all.count(_._2.startsWith("c")) == 5)
    assert(all.count(_._2.startsWith("torn")) == 9,
      "a late-committed batch streams exactly once")
    // idle restart delivers nothing new
    drain(table, ckpt, sink)
    assert(sunk(sink) == all)
  }

  test("rewrites never re-deliver; fresh streams get each chain's live member; delete guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream2").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatchWithStats(rows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    drain(table, ckpt, sink)
    assert(sunk(sink).size == 5)

    // upsert: id 3 updated, 100 inserted — the restarted stream gets
    // ONLY the upsert's new batch, never the rewrite's carried copies
    CommitLog.upsert(spark, table,
      Seq((3L, "NEW-3"), (100L, "NEW-100")).toDF("id", "v"),
      "id", "r2", 0L, ts = 2000L, statsCols = Seq("id"))
    drain(table, ckpt, sink)
    val afterUpsert = sunk(sink)
    assert(afterUpsert.size == 7, afterUpsert.toString) // 5 + 2 new
    assert(afterUpsert.contains((3L, "NEW-3")) && afterUpsert.contains((3L, "a-3")),
      "append stream keeps history; updates arrive as new rows")

    // a FRESH stream on the upserted table delivers current state:
    // the rewrite (matched key removed once) + the new batch
    val (ckpt2, sink2) = (s"$dir/ckpt2", s"$dir/sink2")
    drain(table, ckpt2, sink2)
    assert(sunk(sink2) ==
      CommitLog.readCommitted(spark, table).get
        .select("id", "v").as[(Long, String)].collect().toSet)

    // un-compacted delete: a fresh stream fails loudly...
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 3000L)
    val (ckpt3, sink3) = (s"$dir/ckpt3", s"$dir/sink3")
    val e = intercept[Exception] { drain(table, ckpt3, sink3) }
    def rootMsg(t: Throwable): String =
      (t.getMessage match { case null => "" case m => m }) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("compactDeletes"))
    // ...streams with ignoreDeletes, or after compaction
    val (ckpt4, sink4) = (s"$dir/ckpt4", s"$dir/sink4")
    drain(table, ckpt4, sink4, ignoreDeletes = true)
    assert(sunk(sink4).contains((1L, "a-1")), "pre-delete rows opted into")
    CommitLog.compactDeletes(spark, table, ts = 4000L)
    val (ckpt5, sink5) = (s"$dir/ckpt5", s"$dir/sink5")
    drain(table, ckpt5, sink5)
    assert(sunk(sink5) ==
      CommitLog.readCommitted(spark, table).get
        .select("id", "v").as[(Long, String)].collect().toSet)

    // the EXISTING stream (which already saw the deleted row) resumes
    // fine past the compaction: the rw rewrite's chain is covered
    drain(table, ckpt, sink)
    assert(sunk(sink) == afterUpsert, "compaction must not re-deliver")
  }

  test("streaming offsets round-trip their serialization") {
    val o = CommitLogStreamOffset(
      Set(("r1", 3L), ("run with space", 0L)), Set(("r1up00abcdef", 3L)))
    assert(CommitLogStreamOffset.parse(o.json()) == o)
    assert(CommitLogStreamOffset.parse("") ==
      CommitLogStreamOffset(Set.empty, Set.empty))
  }

  test("offsets are range-compressed: byte size is flat in batch count, not linear") {
    def dense(n: Int) = CommitLogStreamOffset(
      (0 until n).map(i => ("run2024", i.toLong)).toSet, Set.empty)
    // the r16 format was O(batches): ~9 bytes per batch. v2 folds a
    // sequential run into ONE range — 120 and 5000 batches serialize
    // to the same handful of bytes (the 100 TB long-lived-table fix)
    val j120 = dense(120).json()
    val j5000 = dense(5000).json()
    assert(j120 == "v2|run2024:0~119|", j120)
    assert(j5000.length == j120.length + 1, s"${j5000.length} vs ${j120.length}")
    assert(CommitLogStreamOffset.parse(j5000) == dense(5000))
    // gaps stay exact: each contiguous span is its own range
    val gappy = CommitLogStreamOffset(
      Set(("r", 0L), ("r", 1L), ("r", 5L), ("r", 7L), ("r", 8L)),
      Set(("rup00abcdef", 5L)))
    assert(CommitLogStreamOffset.parse(gappy.json()) == gappy)
    assert(gappy.json() == "v2|r:0~1,5,7~8|rup00abcdef:5")
  }

  test("r16-format checkpoints (full enumeration) still parse") {
    val legacy = "r1,0;r1,1;run+with+space,2;~r1up00abcdef,1"
    assert(CommitLogStreamOffset.parse(legacy) == CommitLogStreamOffset(
      Set(("r1", 0L), ("r1", 1L), ("run with space", 2L)),
      Set(("r1up00abcdef", 1L))))
  }

  test("checkpoint replay of a pre-delete micro-batch resumes after compactDeletes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream3").toString
    val table = s"$dir/t"
    CommitLog.writeBatchWithStats(rows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    val stream = new CommitLogMicroBatchStream(table,
      CommitLog.readCommitted(spark, table).get.schema, ignoreDeletes = false)
    // the offsets a checkpointed micro-batch recorded BEFORE the
    // tombstone landed
    val start = stream.initialOffset()
    val end = stream.latestOffset()
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 2000L)
    // before compaction the replay hits the loud guard (indistinguishable
    // from a fresh stream) — but its remedy must WORK:
    val e = intercept[RuntimeException] { stream.planInputPartitions(start, end) }
    assert(e.getMessage.contains("compactDeletes"))
    CommitLog.compactDeletes(spark, table, ts = 3000L)
    // after compaction the delete is materialized in the rewrite; the
    // replayed (pre-delete) micro-batch plans and delivers what it
    // originally planned instead of wedging the stream forever
    val parts = stream.planInputPartitions(start, end)
    assert(parts.nonEmpty, "replayed micro-batch must still plan")
    // and a fresh drain of the compacted table needs no ignoreDeletes
    val (ckpt, sink) = (s"$dir/ckpt", s"$dir/sink")
    drain(table, ckpt, sink)
    assert(sunk(sink) == CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toSet)
  }

  test("maxBatchesPerTrigger drains a backlog oldest-first in bounded micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream5").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    for (b <- 0 until 7)
      CommitLog.writeBatch(rows(b * 10, 3, s"b$b"), table, "r1", b.toLong,
        ts = 1000L * (b + 1))

    val q = spark.readStream.format("graft_commitlog")
      .option("maxBatchesPerTrigger", "2").load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()

    // all 7 batches delivered exactly-once...
    assert(sunk(sink) == (0 until 7)
      .flatMap(b => (0 until 3).map(i => (b * 10L + i, s"b$b-$i"))).toSet)
    // ...across ceil(7/2) = 4 micro-batches, not one flood (the
    // parquet sink writes one commit per micro-batch)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits == 4, s"expected 4 rate-limited micro-batches, got $commits")

    // a late batch streams after restart, still limited
    CommitLog.writeBatch(rows(900, 2, "late"), table, "r1", 9L, ts = 9000L)
    val q2 = spark.readStream.format("graft_commitlog")
      .option("maxBatchesPerTrigger", "2").load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    assert(sunk(sink).count(_._2.startsWith("late")) == 2)
    assert(sunk(sink).size == 23)
  }

  test("maxBatchesPerTrigger on a backlog containing rewrites loses nothing") {
    // the r17 bug: the rate-limited offset folded ALL retired
    // originals (tip.covered) into the offset before their live
    // rewrites were admitted, so the next trigger's chainSeen found
    // the ancestor in start.all and classified the still-undelivered
    // rewrite as already-seen — its rows silently never delivered
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream7").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatchWithStats(rows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.writeBatchWithStats(rows(10, 5, "b"), table, "r1", 1L,
      Seq("id"), ts = 2000L)
    CommitLog.writeBatchWithStats(rows(20, 5, "c"), table, "r1", 2L,
      Seq("id"), ts = 3000L)
    // stats-pruned upsert rewrites ONLY batch 0 (key 3 ∈ [0,4]);
    // its rewrite commits LAST (ts 4000), so a 1-batch-per-trigger
    // fresh stream admits older plain appends before the rewrite
    CommitLog.upsert(spark, table, Seq((3L, "NEW-3")).toDF("id", "v"),
      "id", "r2", 0L, ts = 4000L, statsCols = Seq("id"))

    val q = spark.readStream.format("graft_commitlog")
      .option("maxBatchesPerTrigger", "1").load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()

    // a fresh stream must deliver exactly the table's current state:
    // batch 0's rewrite (4 surviving rows), batches 1-2, the new batch
    assert(sunk(sink) == CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toSet)
    assert(sunk(sink).count(_._2.startsWith("a")) == 4,
      "the rewrite's carried rows must not be dropped by admission control")
  }

  test("corrupt v2 offset ranges fail loudly instead of materializing unbounded sets") {
    val e = intercept[RuntimeException] {
      CommitLogStreamOffset.parse("v2|r:0~9999999999999|")
    }
    assert(e.getMessage.contains("corrupt"))
    val e2 = intercept[RuntimeException] {
      CommitLogStreamOffset.parse("v2|r:9~3|")
    }
    assert(e2.getMessage.contains("corrupt"))
  }

  test("stream reads older narrow-typed batches through parquet type promotion") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream6").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    // batch 0 wrote INT ids; batch 1 widened to BIGINT — a stream
    // starting AFTER the widening freezes the reconciled (BIGINT)
    // schema and must read batch 0's INT32 files through promotion
    CommitLog.writeBatch(Seq((1, "a-1"), (2, "a-2")).toDF("id", "v"),
      table, "r1", 0L, ts = 1000L)
    CommitLog.writeBatch(Seq((10L, "b-10")).toDF("id", "v"),
      table, "r1", 1L, ts = 2000L)
    assert(CommitLog.readCommitted(spark, table).get.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    drain(table, ckpt, sink)
    assert(sunk(sink) == Set((1L, "a-1"), (2L, "a-2"), (10L, "b-10")))
  }

  test("streaming change feed: exactly-once CDC across restarts; upsert = one delete+insert pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcstream").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    def drainCdc(ck: String, out: String): Unit = {
      val q = spark.readStream.format("graft_commitlog")
        .option("readChangeFeed", "true").load(table)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    def events(out: String): Seq[(Long, String, String, Long)] =
      spark.read.parquet(out).select("id", "v", "change_type", "change_ts")
        .as[(Long, String, String, Long)].collect().toSeq.sorted

    CommitLog.writeBatchWithStats(rows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    drainCdc(ckpt, sink)
    assert(events(sink) == (0 until 5)
      .map(i => (i.toLong, s"a-$i", "insert", 1000L)).sorted)
    // the streamed feed carries the total-order seq column (r19) and
    // every event has one (legacy ts fallback included)
    val seqs = spark.read.parquet(sink).select("_change_seq")
      .as[Long].collect()
    assert(seqs.length == 5 && seqs.forall(_ == 1000L), seqs.toSeq.toString)

    // upsert (update id 3, insert id 100) + a row delete, then resume:
    // the RESTARTED stream delivers exactly the incremental events
    CommitLog.upsert(spark, table,
      Seq((3L, "NEW-3"), (100L, "NEW-100")).toDF("id", "v"),
      "id", "r2", 0L, ts = 2000L, statsCols = Seq("id"))
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 3000L)
    drainCdc(ckpt, sink)
    val all = events(sink)
    assert(all.count(_ == ((3L, "a-3", "delete", 2000L))) == 1,
      s"upsert pre-image exactly once: $all")
    assert(all.count(_ == ((3L, "NEW-3", "insert", 2000L))) == 1)
    assert(all.count(_ == ((100L, "NEW-100", "insert", 2000L))) == 1)
    assert(all.count(_ == ((1L, "a-1", "delete", 3000L))) == 1,
      s"tombstone delete exactly once: $all")
    assert(all.size == 9, s"5 inserts + upsert pair + 1 delete: $all")

    // idle restart: nothing re-delivers
    drainCdc(ckpt, sink)
    assert(events(sink).size == 9)
    // compaction (carried copies) emits NOTHING on the change feed
    CommitLog.compactDeletes(spark, table, ts = 4000L)
    drainCdc(ckpt, sink)
    assert(events(sink).size == 9, "compaction must not re-report")
    // a later append arrives incrementally
    CommitLog.writeBatch(rows(200, 2, "late"), table, "r1", 1L, ts = 5000L)
    drainCdc(ckpt, sink)
    assert(events(sink).size == 11)
    assert(events(sink).count(_._3 == "insert") == 9)

    // a FRESH stream replays the table's whole recorded history
    val (ckpt2, sink2) = (s"$dir/ckpt2", s"$dir/sink2")
    drainCdc(ckpt2, sink2)
    val hist = events(sink2)
    assert(hist.size == 11, hist.toString)
    assert(hist.count(_._3 == "delete") == 2)

    // batch read with the streaming option fails loudly
    val e = intercept[Exception] {
      spark.read.format("graft_commitlog")
        .option("readChangeFeed", "true").load(table).collect()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage match { case null => "" case m => m }) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("STREAMING"))
  }

  test("streaming change feed: startingTimestamp skips history, delivers only later changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcstream3").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatchWithStats(rows(0, 5, "old"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 2000L)
    CommitLog.writeBatchWithStats(rows(10, 2, "new"), table, "r1", 1L,
      Seq("id"), ts = 3000L)
    val q = spark.readStream.format("graft_commitlog")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", "1500").load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.read.parquet(sink)
      .select("id", "v", "change_type", "change_ts")
      .as[(Long, String, String, Long)].collect().toSet
    // the delete (2000) and the later inserts (3000) — never the
    // pre-T history (the 5 'old' inserts at 1000)
    assert(got == Set(
      (1L, "old-1", "delete", 2000L),
      (10L, "new-0", "insert", 3000L),
      (11L, "new-1", "insert", 3000L)), got.toString)
    // the option is CDC-only: the append stream rejects it loudly
    val e = intercept[Exception] {
      spark.readStream.format("graft_commitlog")
        .option("startingTimestamp", "1500").load(table)
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage match { case null => "" case m => m }) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("readChangeFeed"))
  }

  test("streaming change feed: startingVersion resumes past an exact _change_seq, no duplicates or drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcstream4").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatchWithStats(rows(0, 5, "old"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 2000L)
    // the boundary a consumer would persist: the delete's _change_seq
    val resumeFrom = CommitLog.logState(spark, table).maxSeq
    assert(resumeFrom == 2000L)
    CommitLog.writeBatchWithStats(rows(10, 2, "new"), table, "r1", 1L,
      Seq("id"), ts = 3000L)
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(10L), ts = 4000L)
    val q = spark.readStream.format("graft_commitlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", resumeFrom.toString).load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.read.parquet(sink)
      .select("id", "v", "change_type", "_change_seq")
      .as[(Long, String, String, Long)].collect().toSet
    // everything with seq > resumeFrom, nothing at or before it: the
    // boundary event itself (the delete at seq 2000) never re-delivers
    assert(got == Set(
      (10L, "new-0", "insert", 3000L),
      (11L, "new-1", "insert", 3000L),
      (10L, "new-0", "delete", 4000L)), got.toString)
    // both skip options at once is ambiguous — loud
    val e = intercept[Exception] {
      spark.readStream.format("graft_commitlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("startingTimestamp", "1").load(table)
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage match { case null => "" case m => m }) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("not both"))
  }

  test("streaming change feed: maxBatchesPerTrigger paces the history replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcstream2").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    for (b <- 0 until 5)
      CommitLog.writeBatch(rows(b * 10, 2, s"b$b"), table, "r1", b.toLong,
        ts = 1000L * (b + 1))
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(0L), ts = 9000L)
    val q = spark.readStream.format("graft_commitlog")
      .option("readChangeFeed", "true")
      .option("maxBatchesPerTrigger", "2").load(table)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.read.parquet(sink)
      .select("id", "v", "change_type").as[(Long, String, String)]
      .collect().toSeq
    assert(got.size == 11, s"10 inserts + 1 delete: $got") // 5x2 + delete
    assert(got.count(_._3 == "delete") == 1)
    // ceil(6 units / 2) = 3 rate-limited micro-batches
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits == 3, s"expected 3 paced micro-batches, got $commits")
  }

  test("an old checkpoint keeps resolving across compactLog") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clstream4").toString
    val (table, ckpt, sink) = (s"$dir/t", s"$dir/ckpt", s"$dir/sink")
    CommitLog.writeBatch(rows(0, 3, "a"), table, "r1", 0L, ts = 1000L)
    CommitLog.writeBatch(rows(10, 3, "b"), table, "r1", 1L, ts = 2000L)
    drain(table, ckpt, sink)
    assert(sunk(sink).size == 6)
    // fold the markers into a snapshot, then append: the checkpoint
    // written before the compaction must deliver ONLY the new batch
    CommitLog.compactLog(spark, table)
    CommitLog.writeBatch(rows(20, 3, "c"), table, "r1", 2L, ts = 3000L)
    drain(table, ckpt, sink)
    val all = sunk(sink)
    assert(all.size == 9, all.toString)
    assert(all.count(_._2.startsWith("c")) == 3)
  }
}
