package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("native as-of exec matches the composed operator on real event data") {
    import graft.plans.NativeAsofJoin
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001").drop("ts_us")
    val purchases = ev.where(col("event_type") === "purchase")
    val signups = ev.where(col("event_type") === "signup")

    val composed = AsofJoin.asofJoin(purchases, signups, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().toMap
    val native = NativeAsofJoin.asofJoin(purchases, signups, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().toMap
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("native as-of exec basic semantics (no match → null, newest-at-or-before wins)") {
    import graft.plans.NativeAsofJoin
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"), (2L, 50L, "q1"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, 100.0), (1L, 15L, 200.0), (2L, 60L, 300.0))
      .toDF("k", "t", "v")
    val res = NativeAsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(res == Map(
      "p0" -> None, "p1" -> Some(100.0), "p2" -> Some(200.0), "q1" -> None))
  }

  test("right row exactly at the left timestamp is visible") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "t", "v")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(res.contains(7.0))
  }

  test("a NULL in the matched row's value column stays NULL (no backfill)") {
    // newest at-or-before row for t=12 is (t=10, v=null); an older
    // non-null v=1.0 must NOT leak through
    val left = Seq((1L, 12L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, Some(1.0)), (1L, 10L, None)).toDF("k", "t", "v")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(res.isEmpty)
  }

  test("multiple value columns come from the SAME matched right row") {
    // matched row (t=10) has a=null, b=2.0; older row has a=1.0, b=null.
    // Per-column carry would stitch (1.0, 2.0) from two rows — wrong.
    val left = Seq((1L, 12L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, Some(1.0), None: Option[Double]),
                    (1L, 10L, None: Option[Double], Some(2.0)))
      .toDF("k", "t", "a", "b")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("a", "b"))
      .select("asof_a", "asof_b").as[(Option[Double], Option[Double])].head()
    assert(res == (None, Some(2.0)))
  }

  test("tolerance bounds staleness identically in composed and native forms") {
    // right at t=5; left probes at t=10 (staleness 5) and t=40 (30)
    val left = Seq((1L, 10L, "near"), (1L, 40L, "far")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, 7.0)).toDF("k", "t", "v")

    val composed = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"), tolerance = Some(10L))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(composed == Map("near" -> Some(7.0), "far" -> None))

    import graft.plans.NativeAsofJoin
    val native = NativeAsofJoin.asofJoin(left, right, "k", "t", Seq("v"), tolerance = Some(10L))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(native == composed)

    // no tolerance → both rows match
    val open = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(open == Map("near" -> Some(7.0), "far" -> Some(7.0)))
  }

  test("NULL right-side times never match and never crash (both forms)") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val right = Seq((Some(1L), None: Option[Long], 9.0), (Some(1L), Some(5L), 4.0))
      .toDF("k", "t", "v")
    val composed = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(composed.contains(4.0)) // the null-time row must not be carried

    import graft.plans.NativeAsofJoin
    // native with tolerance active exercises the carried-time extraction
    val native = NativeAsofJoin.asofJoin(left, right, "k", "t", Seq("v"),
        tolerance = Some(100L))
      .select("asof_v").as[Option[Double]].head()
    assert(native.contains(4.0))
  }

  test("NULL keys never match (aligned with the native exec)") {
    val left = Seq((None: Option[Long], 10L, "l-null"), (Some(1L), 10L, "l-1"))
      .toDF("k", "t", "name")
    val right = Seq((None: Option[Long], 5L, 9.0), (Some(1L), 5L, 4.0))
      .toDF("k", "t", "v")
    val res = AsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(res == Map("l-null" -> None, "l-1" -> Some(4.0)))

    import graft.plans.NativeAsofJoin
    val native = NativeAsofJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(native == res)
  }
}
