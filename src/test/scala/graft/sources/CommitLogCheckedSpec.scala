package graft.sources

import graft.SparkSpec
import graft.rules.{Rule, RuleSet}
import org.apache.spark.sql.functions._

/** r20: write-time CHECK constraints — a RuleSet enforced at the
  * commit-log front door, rejects routed to a commit-log error table
  * in the same statement identity. */
class CommitLogCheckedSpec extends SparkSpec {
  import spark.implicits._

  private val rules = RuleSet(Seq(
    Rule("v_present", col("v").isNull || length(col("v")) === 0,
      "v required"),
    Rule("id_pos", col("id") <= 0, "id must be positive")))

  private def rows3 = Seq((1L, "a"), (-2L, "b"), (3L, "")).toDF("id", "v")

  test("writeBatchChecked routes valid/reject rows to the two tables atomically per table") {
    val root = java.nio.file.Files.createTempDirectory("graft-chk").toString
    val (table, errs) = (s"$root/t", s"$root/e")
    val (nv, ne) = CommitLogChecked.writeBatchChecked(rows3, table, rules,
      errs, "r1", 0L, Seq("id"), ts = 1000L)
    assert((nv, ne) == (1L, 2L))
    assert(CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toSeq == Seq(1L -> "a"))
    val rejected = CommitLog.readCommitted(spark, errs).get
      .select("id", "_errors").as[(Long, String)].collect().toSet
    assert(rejected == Set(-2L -> "id must be positive", 3L -> "v required"))
    // retry of the same batch is idempotent on BOTH tables (markers
    // no-op, partitions overwrite themselves)
    CommitLogChecked.writeBatchChecked(rows3, table, rules, errs,
      "r1", 0L, Seq("id"), ts = 1000L)
    assert(CommitLog.readCommitted(spark, table).get.count() == 1)
    assert(CommitLog.readCommitted(spark, errs).get.count() == 2)
    // an all-valid batch writes nothing to the error table
    val (nv2, ne2) = CommitLogChecked.writeBatchChecked(
      Seq((10L, "x")).toDF("id", "v"), table, rules, errs, "r1", 1L,
      Seq("id"), ts = 2000L)
    assert((nv2, ne2) == (1L, 0L))
    assert(CommitLog.readCommitted(spark, errs).get.count() == 2)
  }

  test("mergeChecked: valid rows merge (update/insert/delete ops), violating rows are rejected wholesale") {
    val root = java.nio.file.Files.createTempDirectory("graft-chkm").toString
    val (table, errs) = (s"$root/t", s"$root/e")
    CommitLog.writeBatchWithStats(
      Seq((1L, "a", "U"), (2L, "b", "U"), (3L, "c", "U"))
        .toDF("id", "v", "op"), table, "r1", 0L, Seq("id"), ts = 1000L)
    // source: update id 1 (valid), delete id 2 (valid op), update id 3
    // with an EMPTY v (violates — must neither update nor delete),
    // insert id 9 with id<=0 sibling rejected
    val src = Seq((1L, "A2", "U"), (2L, "gone", "D"), (3L, "", "U"),
      (-9L, "z", "U")).toDF("id", "v", "op")
    val (nv, ne) = CommitLogChecked.mergeChecked(spark, table, src,
      Seq("id"), rules, errs, "m", 0L, ts = 2000L, statsCols = Seq("id"),
      deleteWhen = Some(col("op") === "D"), dropCols = Seq("op"))
    assert((nv, ne) == (2L, 2L))
    val state = CommitLog.readCommitted(spark, table).get
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(state == Set(1L -> "A2", 3L -> "c"))
    val rejected = CommitLog.readCommitted(spark, errs).get
      .select("id", "_errors").as[(Long, String)].collect().toSet
    assert(rejected == Set(3L -> "v required", -9L -> "id must be positive"))
  }
}
