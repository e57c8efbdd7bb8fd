package graft.ops

import graft.SparkSpec

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaLevel folds the ordered series seeded with the first value") {
    val df = Seq(
      ("u1", 3L, 30L, 4.0), ("u1", 1L, 10L, 8.0), ("u1", 2L, 20L, 0.0),
      ("u2", 1L, 11L, 5.0)
    ).toDF("k", "t", "id", "v")
    val got = Smoothing.ewmaLevel(df, "k", "t", "id", "v", alpha = 0.25)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // u1 ordered by t: 8, 0, 4 → 8 → 8*.75+0*.25=6 → 6*.75+4*.25=5.5
    assert(got("u1") == ((3L, 5.5)))
    assert(got("u2") == ((1L, 5.0)))
  }

  test("result is invariant to input row order and partitioning") {
    val base = (1 to 200).map(i => ("k", i.toLong, i.toLong, (i * 7 % 13).toDouble))
    val a = Smoothing.ewmaLevel(base.toDF("k", "t", "id", "v").repartition(7),
      "k", "t", "id", "v", 0.5).collect()(0).getDouble(2)
    val b = Smoothing.ewmaLevel(scala.util.Random.shuffle(base).toDF("k", "t", "id", "v"),
      "k", "t", "id", "v", 0.5).collect()(0).getDouble(2)
    assert(a == b)
  }

  test("ties on the order column are broken by the tie column") {
    val df = Seq(("k", 1L, 2L, 100.0), ("k", 1L, 1L, 0.0)).toDF("k", "t", "id", "v")
    val level = Smoothing.ewmaLevel(df, "k", "t", "id", "v", 0.5)
      .collect()(0).getDouble(2)
    // order (t,id): 0 then 100 → 0*.5 + 100*.5 = 50
    assert(level == 50.0)
  }

  test("null values are excluded; alpha is guarded") {
    val df = Seq(("k", 1L, 1L, Some(2.0)), ("k", 2L, 2L, None))
      .toDF("k", "t", "id", "v")
    val r = Smoothing.ewmaLevel(df, "k", "t", "id", "v", 0.25).collect()(0)
    assert(r.getLong(1) == 1L && r.getDouble(2) == 2.0)
    intercept[IllegalArgumentException] {
      Smoothing.ewmaLevel(df, "k", "t", "id", "v", 1.0)
    }
  }
}
