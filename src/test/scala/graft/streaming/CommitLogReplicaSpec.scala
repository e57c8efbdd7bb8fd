package graft.streaming

import graft.SparkSpec
import graft.sources.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CDC replica must converge to the source's key-wise state after
  * every kind of change — inserts, upserts (delete+insert pairs),
  * row deletes, full-batch deletes — exactly once across restarts,
  * with the feed's meta columns never reaching the replica. */
class CommitLogReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Long, n: Int, tag: String) =
    (0 until n).map(i => (lo + i, s"$tag-$i")).toDF("id", "v")

  private def canon(df: DataFrame): Set[(Long, String)] =
    df.select("id", "v").as[(Long, String)].collect().toSet

  test("replica converges to the source across inserts, upserts, and deletes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replica").toString
    val (src, rep, ckpt) = (s"$dir/src", s"$dir/rep", s"$dir/ckpt")
    def sync(): Unit = {
      val q = CommitLogReplica.start(spark, src, rep, Seq("id"), ckpt,
        statsCols = Seq("id"))
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    def assertConverged(): Unit = {
      val s = canon(CommitLog.readCommitted(spark, src).get)
      val r = canon(CommitLog.readCommitted(spark, rep).get)
      assert(r == s, s"replica drifted:\n source=$s\n replica=$r")
      assert(!CommitLog.readCommitted(spark, rep).get.columns
        .contains("change_type"), "feed meta columns must never land")
    }

    // bootstrap: two batches replay as history
    CommitLog.writeBatchWithStats(rows(0, 5, "a"), src, "r1", 0L,
      Seq("id"), ts = 1000L)
    CommitLog.writeBatchWithStats(rows(10, 5, "b"), src, "r1", 1L,
      Seq("id"), ts = 2000L)
    sync(); assertConverged()

    // upsert (update id 3, insert id 100) — the delete+insert pair
    // must net to the new value on the replica
    CommitLog.upsert(spark, src,
      Seq((3L, "NEW-3"), (100L, "NEW-100")).toDF("id", "v"),
      "id", "r2", 0L, ts = 3000L, statsCols = Seq("id"))
    sync(); assertConverged()
    assert(canon(CommitLog.readCommitted(spark, rep).get)
      .contains((3L, "NEW-3")))

    // row delete, then a fresh append, applied across two restarts
    CommitLog.deleteWhere(spark, src, "id", "in", Seq(1L), ts = 4000L)
    sync(); assertConverged()
    assert(!canon(CommitLog.readCommitted(spark, rep).get).exists(_._1 == 1L))
    CommitLog.writeBatchWithStats(rows(200, 2, "c"), src, "r1", 2L,
      Seq("id"), ts = 5000L)
    sync(); assertConverged()

    // idle restart: replica untouched (no new markers)
    val before = CommitLog.committedBatches(spark, rep)
    sync()
    assert(CommitLog.committedBatches(spark, rep) == before,
      "idle sync must commit nothing")

    // source compaction emits no change events — replica untouched
    CommitLog.compactDeletes(spark, src, ts = 6000L)
    sync(); assertConverged()
    assert(CommitLog.committedBatches(spark, rep) == before)
  }

  test("replayed epoch is a no-op once its marker landed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replica2").toString
    val (src, rep) = (s"$dir/src", s"$dir/rep")
    CommitLog.writeBatchWithStats(rows(0, 3, "a"), src, "r1", 0L,
      Seq("id"), ts = 1000L)
    val feed = CommitLog.readChangeFeed(spark, src, 0L).get
    CommitLogReplica.applyEpoch(feed, rep, Seq("id"), "run", 0L, Seq("id"))
    val state = canon(CommitLog.readCommitted(spark, rep).get)
    val markers = CommitLog.committedBatches(spark, rep)
    // the at-least-once redelivery: same epoch applied again
    CommitLogReplica.applyEpoch(feed, rep, Seq("id"), "run", 0L, Seq("id"))
    assert(canon(CommitLog.readCommitted(spark, rep).get) == state)
    assert(CommitLog.committedBatches(spark, rep) == markers,
      "replay must not double-apply")
  }
}
