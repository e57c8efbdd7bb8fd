package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]): Map[String, Row] =
    Changepoint.meanShift(rows.toDF("k", "t", "v"), "k", "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap

  test("clean level shift is localized exactly") {
    // 20 points at 100 then 20 at 500: split after index 20
    val rows = (1L to 40L).map(t => ("a", t, if (t <= 20) 100L else 500L))
    val r = run(rows)("a")
    assert(r.getLong(2) == 20L, s"cp_index ${r.getLong(2)}")
    assert(r.getLong(1) == 20L) // cp_at = last left t
    assert(r.getLong(5) == 100L && r.getLong(6) == 500L)
  }

  test("shift near the edge is still found") {
    val rows = (1L to 30L).map(t => ("a", t, if (t <= 3) 900L else 10L))
    val r = run(rows)("a")
    assert(r.getLong(2) == 3L, s"cp_index ${r.getLong(2)}")
  }

  test("multiple keys localize independently") {
    val a = (1L to 20L).map(t => ("a", t, if (t <= 5) 0L else 1000L))
    val b = (1L to 20L).map(t => ("b", t, if (t <= 15) 1000L else 0L))
    val m = run(a ++ b)
    assert(m("a").getLong(2) == 5L && m("b").getLong(2) == 15L)
  }

  test("constant series scores zero and ties break to the earliest split") {
    val rows = (1L to 10L).map(t => ("a", t, 42L))
    val r = run(rows)("a")
    assert(r.getLong(4) == 0L) // score_floor
    assert(r.getLong(2) == 1L) // tie -> smallest i
  }

  test("single-point series is absent") {
    assert(run(Seq(("a", 1L, 5L))).isEmpty)
  }

  test("deterministic across partitionings") {
    val rows = (1L to 200L).map(t => ("a", t, (t * 37) % 101))
    val r1 = Changepoint.meanShift(rows.toDF("k", "t", "v").repartition(1),
      "k", "t", "v").collect().toSeq
    val r2 = Changepoint.meanShift(rows.toDF("k", "t", "v").repartition(9),
      "k", "t", "v").collect().toSeq
    assert(r1 == r2)
  }
}
