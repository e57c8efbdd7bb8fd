package graft.ops

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin pairs each left row with the newest right row at-or-before it") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 50L, "q1"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, 100.0), (1L, 15L, 200.0), (2L, 60L, 300.0))
      .toDF("k", "t", "v")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(res == Map(
      "p0" -> None,          // no right row at or before t=5
      "p1" -> Some(100.0),   // 8 <= 10 < 15
      "p2" -> Some(200.0),   // 15 <= 20
      "q1" -> None))         // right at 60 is after 50
  }

  test("right row exactly at the left timestamp is visible") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "t", "v")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(res.contains(7.0))
  }
}
