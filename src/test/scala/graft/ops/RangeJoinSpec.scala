package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin basic semantics (inclusive bounds, key equality)") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 90L, 1.0), (1L, 100L, 2.0), (1L, 150L, 3.0),
                    (1L, 201L, 4.0), (2L, 250L, 5.0))
      .toDF("k", "t", "v")
    // window [t-50, t-1]: strictly-before, up to 50 back
    val res = RangeJoin.rangeJoin(left, right, "k", "t", "t", -50L, -1L)
      .select("name", "r_v").as[(String, Double)].collect().toSet
    assert(res == Set(("a", 1.0), ("b", 3.0)))
  }

  test("bucketed rangeJoin matches the naive non-equi join on real event data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001").drop("ts_us", "props")
    val purchases = ev.where(col("event_type") === "purchase")
    val clicks = ev.where(col("event_type") === "click")
    val lower = -3600L * 1000000000L; val upper = -1L

    val bucketed = RangeJoin.rangeJoin(purchases, clicks, "user_id", "ts", "ts", lower, upper)
      .select(col("event_id"), col("r_event_id")).as[(Long, Long)].collect().toSet

    val naive = purchases.as("l").join(clicks.as("r"),
        col("l.user_id") === col("r.user_id") &&
        col("r.ts") >= col("l.ts") + lower && col("r.ts") <= col("l.ts") + upper)
      .select(col("l.event_id"), col("r.event_id")).as[(Long, Long)].collect().toSet

    assert(bucketed.nonEmpty && bucketed == naive)
  }

  test("boundary rows at bucket edges are not dropped or duplicated") {
    // right rows exactly on multiples of the bucket width W = span = 100
    val left = Seq((1L, 1000L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 900L, 1.0), (1L, 999L, 2.0), (1L, 1000L, 3.0), (1L, 899L, 4.0))
      .toDF("k", "t", "v")
    val res = RangeJoin.rangeJoin(left, right, "k", "t", "t", -100L, -1L)
      .select("r_v").as[Double].collect().sorted
    assert(res.toSeq == Seq(1.0, 2.0)) // 1000 excluded (>-1), 899 excluded (<-100)
  }
}
