package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added/removed/changed/unchanged classify correctly, null-safely") {
    val before = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20),
      (3L, Option.empty[String], 30), (4L, Some("d"), 40)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 10),            // unchanged
      (2L, Some("B"), 20),            // changed
      (3L, Option.empty[String], 30), // unchanged (null == null)
      (5L, Some("e"), 50)             // added; 4 removed
    ).toDF("k", "s", "v")
    val m = TableDiff.diff(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
    val s = TableDiff.summary(before, after, Seq("k"))
      .as[(String, Long)].collect().toMap
    assert(s === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 2L))
  }

  test("compareCols restricts what counts as a change") {
    val before = Seq((1L, "x", 1)).toDF("k", "s", "v")
    val after = Seq((1L, "y", 1)).toDF("k", "s", "v")
    assert(TableDiff.diff(before, after, Seq("k"), Seq("v"))
      .head().getString(1) === "unchanged")
    assert(TableDiff.diff(before, after, Seq("k"), Seq("s"))
      .head().getString(1) === "changed")
  }
}
