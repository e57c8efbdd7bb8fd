package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** r20: the commit-arbitration seam — every marker publish (commits,
  * txns, tombstones, snapshot folds) goes through the installed
  * [[CommitArbiter]]; the protocol is unchanged through the default,
  * and a losing publish surfaces per the contract. */
class CommitArbiterSpec extends SparkSpec {
  import spark.implicits._

  test("the whole marker protocol runs through the seam unchanged") {
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    CommitArbiter.install(new CommitArbiter {
      override def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
        seen.incrementAndGet()
        CommitArbiter.Rename.publish(fs, tmp, dst)
      }
    })
    try {
      val table = java.nio.file.Files.createTempDirectory("graft-arb").toString + "/t"
      CommitLog.writeBatchWithStats(
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), table, "r1", 0L,
        Seq("id"), ts = 1000L)
      CommitLog.merge(spark, table, Seq((2L, "B")).toDF("id", "v"),
        Seq("id"), "m", 0L, ts = 2000L, statsCols = Seq("id"))
      CommitLog.deleteWhere(spark, table, "id", "in", Seq(1L), ts = 3000L)
      CommitLog.compactLog(spark, table)
      // commit + txn + tombstone + snapshot all arbitrated
      assert(seen.get() >= 4, s"publishes seen: ${seen.get()}")
      assert(CommitLog.readCommitted(spark, table).get
        .select("id", "v").as[(Long, String)].collect().toSeq ==
        Seq(2L -> "B"))
    } finally CommitArbiter.install(CommitArbiter.Rename)
  }

  test("a publish that loses with no winner marker fails loudly") {
    CommitArbiter.install(new CommitArbiter {
      override def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean =
        false // deny everything: simulated arbitration loss
    })
    try {
      val table = java.nio.file.Files.createTempDirectory("graft-arb2").toString + "/t"
      val e = intercept[RuntimeException] {
        CommitLog.writeBatch(Seq((1L, "a")).toDF("id", "v"), table, "r1", 0L)
      }
      assert(e.getMessage.contains("could not commit"), e.getMessage)
      // nothing became visible
      assert(CommitLog.readCommitted(spark, table).isEmpty)
    } finally CommitArbiter.install(CommitArbiter.Rename)
  }
}
