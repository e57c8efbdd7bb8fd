package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19: write-time change data (`_changes/` partitions referenced from
  * transaction markers), the monotonic commit/tombstone sequence and
  * its `_change_seq` feed column, OCC retry for data merges, and the
  * vacuum story for orphaned change partitions. */
class CommitLogChangeDataSpec extends SparkSpec {
  import spark.implicits._

  private def idRows(lo: Long, n: Int, tag: String) =
    (0 until n).map(i => (lo + i, s"$tag-$i")).toDF("id", "v")

  test("merge persists write-time change data; the feed replays it with no exceptAll/anti-join") {
    val table = java.nio.file.Files.createTempDirectory("graft-cdata").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.merge(spark, table,
      Seq((3L, "NEW-3"), (500L, "NEW-500")).toDF("id", "v"),
      Seq("id"), "r2", 0L, ts = 2000L, statsCols = Seq("id"))

    // the marker references a _changes partition that physically exists
    val st = CommitLog.logState(spark, table)
    val cd = st.meta.valuesIterator.flatMap(_.cdata).toSeq.distinct
    assert(cd.size == 1, s"one merge, one change partition: $cd")
    assert(new java.io.File(s"$table/_changes/${cd.head}").isDirectory)

    // a CDC consumer replaying the merge era reads O(changed rows):
    // no Except, no anti-join anywhere in the plan (the r18 shape
    // recomputed original ∖ rewrite per rewrite per consumer)
    val feed = CommitLog.readChangeFeed(spark, table, 1500L).get
    val plan = feed.queryExecution.optimizedPlan.toString
    // Catalyst rewrites exceptAll into replicaterows+aggregate early —
    // both spellings (and an anti-join) must be absent
    assert(!plan.contains("Except") && !plan.contains("replicaterows"), plan)
    assert(!plan.toLowerCase.contains("leftanti"), plan)
    val evs = feed.select("change_type", "change_ts", "id", "v")
      .as[(String, Long, Long, String)].collect().toSet
    assert(evs == Set(
      ("delete", 2000L, 3L, "a-3"),
      ("insert", 2000L, 3L, "NEW-3"),
      ("insert", 2000L, 500L, "NEW-500")))

    // legacy fallback: with the change partition gone (an old table,
    // or an aged-out one) the feed reconstructs the identical events
    // from original ∖ rewrite as before
    val hfs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$table/_changes"), true)
    val legacy = CommitLog.readChangeFeed(spark, table, 1500L).get
      .select("change_type", "change_ts", "id", "v")
      .as[(String, Long, Long, String)].collect().toSet
    assert(legacy == evs)
    assert(CommitLog.readChangeFeed(spark, table, 1500L).get
      .queryExecution.optimizedPlan.toString.contains("replicaterows"))
  }

  test("change data covers every affected batch; fully-consumed originals report once and outlive vacuum") {
    val table = java.nio.file.Files.createTempDirectory("graft-cdata2").toString + "/t"
    // batch 0 holds ONLY merged keys (fully consumed → retire-only);
    // batch 1 is partially matched (surviving rewrite)
    CommitLog.writeBatchWithStats(idRows(0, 2, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.writeBatchWithStats(idRows(100, 4, "b"), table, "r1", 1L,
      Seq("id"), ts = 1001L)
    CommitLog.merge(spark, table,
      Seq((0L, "N0"), (1L, "N1"), (100L, "N100")).toDF("id", "v"),
      Seq("id"), "m", 0L, ts = 2000L, statsCols = Seq("id"))
    def mergeEvents() = CommitLog.readChangeFeed(spark, table, 1500L).get
      .select("change_type", "id", "v")
      .as[(String, Long, String)].collect().toList
    val evs = mergeEvents()
    val deletes = evs.filter(_._1 == "delete").toSet
    assert(evs.count(_._1 == "delete") == 3, s"no double-report: $evs")
    assert(deletes == Set(("delete", 0L, "a-0"), ("delete", 1L, "a-1"),
      ("delete", 100L, "b-0")))
    assert(CommitLog.readCommitted(spark, table).get.count() == 6)
    // the retire carries the change-partition reference too: vacuum
    // reclaiming the retired ORIGINAL dirs does not lose the merge
    // era's CDC history (r18 failed loudly here; referenced change
    // partitions are kept)
    CommitLog.vacuum(spark, table, graceMs = -1L)
    val hfs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(
      s"$table/run_id=r1/batch_id=0")), "retired original reclaimed")
    assert(mergeEvents() == evs, "merge-era CDC replay survives vacuum")
  }

  test("same-millisecond merges totally order by seq; the replica reduce is deterministic") {
    val table = java.nio.file.Files.createTempDirectory("graft-seq").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 4, "base"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    // two merges to the SAME key committing at the SAME pinned wall
    // millisecond — the r18 feed could not order them
    CommitLog.merge(spark, table, Seq((2L, "FIRST")).toDF("id", "v"),
      Seq("id"), "m1", 0L, ts = 5000L, statsCols = Seq("id"))
    CommitLog.merge(spark, table, Seq((2L, "SECOND")).toDF("id", "v"),
      Seq("id"), "m2", 0L, ts = 5000L, statsCols = Seq("id"))
    val st = CommitLog.logState(spark, table)
    val s1 = st.entrySeq(("m1", 0L))
    val s2 = st.entrySeq(("m2", 0L))
    assert(s1 == 5000L && s2 == 5001L,
      s"monotonic seq past the pinned ts tie: $s1, $s2")

    // the feed exposes the order, and the replica's latest-per-key
    // reduce converges on the later merge DETERMINISTICALLY
    val feed = CommitLog.readChangeFeed(spark, table, 0L).get
    val key2 = feed.where(col("id") === 2L)
      .select("change_type", "change_ts", "_change_seq", "v")
      .as[(String, Long, Long, String)].collect().toSet
    assert(key2.contains(("insert", 5000L, 5001L, "SECOND")))
    assert(key2.contains(("insert", 5000L, 5000L, "FIRST")))
    for (run <- 0 until 5) {
      val replica = java.nio.file.Files
        .createTempDirectory(s"graft-seqrep$run").toString + "/t"
      graft.streaming.CommitLogReplica.applyEpoch(
        CommitLog.readChangeFeed(spark, table, 0L).get, replica,
        Seq("id"), runId = "rep", epoch = 0L, statsCols = Seq("id"))
      val got = CommitLog.readCommitted(spark, replica).get
        .where(col("id") === 2L).select("v").as[String].collect().toSeq
      assert(got == Seq("SECOND"), s"run $run converged to $got")
    }
  }

  test("tombstone order is prefix-stable: a later delete with an earlier pinned ts appends") {
    val table = java.nio.file.Files.createTempDirectory("graft-tombseq").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 6, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 5000L)
    // recorded LATER but with an earlier (pinned/skewed-clock) ts: the
    // r18 (ts, col, ...) order would slot it FIRST, shifting the index
    // of the already-streamed tombstone — offset corruption
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(2L), ts = 4000L)
    val st = CommitLog.logState(spark, table)
    assert(st.tombstones.map(_.vals) == Seq(Seq("1"), Seq("2")),
      s"recording order preserved: ${st.tombstones.map(t => (t.ts, t.vals))}")
    assert(st.tombstones.map(st.tombSeq) == Seq(5000L, 5001L))
    // and a third, same-ts delete still appends
    CommitLog.deleteWhere(spark, table, "id", "in", Seq(3L), ts = 4000L)
    val st2 = CommitLog.logState(spark, table)
    assert(st2.tombstones.map(_.vals) == Seq(Seq("1"), Seq("2"), Seq("3")))
  }

  test("OCC retry: a data merge losing the race re-plans against the winner and converges") {
    val table = java.nio.file.Files.createTempDirectory("graft-occ").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 10, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    // the loser plans against r1/0, then the winner retires r1/0 in
    // the race window (the injected hook); the loser's commit
    // conflicts, re-plans against the winner's live rewrite, retries
    var raced = false
    CommitLog.mergeWithHook(spark, table,
      Seq((1L, "LOSER-1")).toDF("id", "v"), Seq("id"), "m2", 0L,
      ts = 3000L, statsCols = Seq("id"),
      beforeCommit = () => if (!raced) {
        raced = true
        CommitLog.merge(spark, table, Seq((2L, "WINNER-2")).toDF("id", "v"),
          Seq("id"), "m1", 0L, ts = 2000L, statsCols = Seq("id"))
      })
    val out = CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(out.size == 10)
    assert(out(1L) == "LOSER-1" && out(2L) == "WINNER-2")
    assert(out(0L) == "a-0" && out(9L) == "a-9")
    // both merges committed; the loser's first-attempt rewrite is an
    // invisible orphan (correctness: the live state has no doubles)
    val st = CommitLog.logState(spark, table)
    assert(st.entries.contains(("m1", 0L)) && st.entries.contains(("m2", 0L)))
  }

  test("retire-only merge: its change partition is retire-referenced and CDC replay survives vacuum") {
    val table = java.nio.file.Files.createTempDirectory("graft-cdret").toString + "/t"
    // batch 0 holds ONLY the keys a delete-only merge consumes: the
    // merge lands NO new batch, so its change partition is referenced
    // exclusively from the RETIRES (r20 — the add-side-only referenced
    // set reclaimed it, then replay needed the original dir the same
    // vacuum had already taken)
    CommitLog.writeBatchWithStats(idRows(0, 2, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.merge(spark, table, Seq((0L, "D"), (1L, "D")).toDF("id", "v"),
      Seq("id"), "m", 0L, ts = 2000L, statsCols = Seq("id"),
      deleteWhen = Some(lit(true)))
    val st = CommitLog.logState(spark, table)
    assert(st.committed.isEmpty && st.retiredCdata.nonEmpty,
      s"pure retire with retire-side cdata: ${st.retired} / ${st.retiredCdata}")
    assert(st.meta.valuesIterator.flatMap(_.cdata).isEmpty,
      "no add entry carries the reference — only the retires do")
    CommitLog.vacuum(spark, table, graceMs = -1L)
    // the original's directory is reclaimed, the change partition is not
    assert(!new java.io.File(s"$table/run_id=r1/batch_id=0").exists())
    assert(new java.io.File(s"$table/_changes").listFiles().nonEmpty)
    // replay of the merge era (post-insert window — the insert era's
    // directory is legitimately gone, the vacuum contract) reads the
    // delete pre-images from the surviving change partition
    val evs = CommitLog.readChangeFeed(spark, table, 1500L).get
      .select("change_type", "id", "v").as[(String, Long, String)]
      .collect().toSet
    assert(evs == Set(("delete", 0L, "a-0"), ("delete", 1L, "a-1")), s"$evs")
  }

  test("write conflicts are typed: class match through wrapper chains; racing mutations never share a seq") {
    // the retry classifier sees through SparkException-style wrapping
    // and never fires on a coincidental message
    val conflict = new CommitLogWriteConflict("x")
    assert(CommitLogWriteConflict.is(conflict))
    assert(CommitLogWriteConflict.is(
      new RuntimeException("outer", new RuntimeException("mid", conflict))))
    assert(!CommitLogWriteConflict.is(
      new RuntimeException("commit-log write conflict on /t: …")))
    assert(!CommitLogWriteConflict.is(null))

    // a merge and a deleteWhere planned from the SAME log state (both
    // would mint seq 2000): the merge's commit-time re-read must bump
    // past the tombstone's seq — equal seqs would silently degrade the
    // total order behind streaming offsets and replica ties
    val table = java.nio.file.Files.createTempDirectory("graft-seqrace").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    var raced = false
    CommitLog.mergeWithHook(spark, table,
      Seq((100L, "NEW")).toDF("id", "v"), Seq("id"), "m", 0L,
      ts = 2000L, statsCols = Seq("id"),
      beforeCommit = () => if (!raced) {
        raced = true
        CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 2000L)
      })
    val st = CommitLog.logState(spark, table)
    val mergeSeq = st.entrySeq(("m", 0L))
    val tombSeq = st.tombSeq(st.tombstones.head)
    assert(tombSeq == 2000L, s"delete minted first: $tombSeq")
    assert(mergeSeq == 2001L,
      s"merge re-minted past the tombstone at commit time: $mergeSeq")
  }

  test("vacuum reclaims orphaned change partitions and keeps referenced ones") {
    val table = java.nio.file.Files.createTempDirectory("graft-cdvac").toString + "/t"
    CommitLog.writeBatchWithStats(idRows(0, 5, "a"), table, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.merge(spark, table, Seq((1L, "N")).toDF("id", "v"),
      Seq("id"), "m", 0L, ts = 2000L, statsCols = Seq("id"))
    val changes = new java.io.File(s"$table/_changes")
    val referenced = changes.listFiles().map(_.getName).toSet
    assert(referenced.nonEmpty)
    // a crashed merge's never-referenced debris
    val orphan = new java.io.File(changes, "cd-crashed-0-deadbeef")
    orphan.mkdirs()
    CommitLog.vacuum(spark, table, graceMs = -1L)
    val left = changes.listFiles().map(_.getName).toSet
    assert(left == referenced, s"orphan reclaimed, references kept: $left")
  }
}
