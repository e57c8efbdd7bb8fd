package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)], target: Double,
      slack: Double, threshold: Double): Map[String, Row] =
    Smoothing.cusumAlerts(rows.toDF("k", "t", "id", "v"), "k", "t", "id",
        "v", target, slack, threshold)
      .collect().map(r => r.getString(0) -> r).toMap

  test("sustained shift accumulates to an alert at the right step") {
    // target 10, slack 1, threshold 5: values jump to 13 at step 6 —
    // each step adds 13-10-1=2, so S+ crosses 5 at step 8 (2,4,6)
    val rows = (1 to 12).map(i =>
      ("a", i.toLong, i.toLong, if (i <= 5) 10.0 else 13.0))
    val r = run(rows, target = 10.0, slack = 1.0, threshold = 5.0)("a")
    assert(r.getLong(3) == 8L, s"first_alert ${r.getLong(3)}")
    assert(r.getLong(2) == 5L) // steps 8..12 all above
  }

  test("a one-off spike decays through the clamp and never alerts") {
    val rows = (1 to 10).map(i =>
      ("a", i.toLong, i.toLong, if (i == 5) 30.0 else 10.0))
    // spike adds 19 once; slack 1 drains 1/step; threshold 25 > 19
    val r = run(rows, 10.0, 1.0, 25.0)("a")
    assert(r.getLong(2) == 0L && r.getLong(3) == -1L)
    assert(r.getDouble(4) < 19.0 && r.getDouble(4) > 0.0)
  }

  test("downward drift trips the negative accumulator") {
    val rows = (1 to 10).map(i =>
      ("a", i.toLong, i.toLong, if (i <= 4) 10.0 else 6.0))
    // each low step adds 10-6-1=3 to S-; threshold 8 crossed at step 7
    val r = run(rows, 10.0, 1.0, 8.0)("a")
    assert(r.getLong(3) == 7L, s"first_alert ${r.getLong(3)}")
    assert(r.getDouble(4) == 0.0) // S+ untouched
  }

  test("keys fold independently and deterministically across partitionings") {
    val rows = (1 to 60).map(i =>
      ((i % 3).toString, i.toLong, i.toLong, (i % 7).toDouble))
    val a = Smoothing.cusumAlerts(rows.toDF("k", "t", "id", "v")
      .repartition(1), "k", "t", "id", "v", 3.0, 0.5, 4.0)
      .orderBy("k").collect().toSeq
    val b = Smoothing.cusumAlerts(rows.toDF("k", "t", "id", "v")
      .repartition(7), "k", "t", "id", "v", 3.0, 0.5, 4.0)
      .orderBy("k").collect().toSeq
    assert(a == b)
  }
}
