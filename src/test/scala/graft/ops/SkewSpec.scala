package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results under a hot key") {
    // 90% of rows share key 1 (pathological skew)
    val big = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(1L).as("k"),
        col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g"))
      .toDF("k", "name")
    val plain = big.join(dim, "k").agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(big, dim, "k", factor = 4)
      .agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    assert(salted == plain)
  }

  test("saltedSum equals plain sum") {
    val df = spark.range(5000)
      .select(when(col("id") % 100 === 0, col("id") % 3).otherwise(0L).as("k"),
        col("id").cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("s")).as[(Long, Double)].collect().toMap
    val salted = Skew.saltedSum(df, "k", "v", factor = 8)
      .as[(Long, Double)].collect().toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }

  test("salt is deterministic (content-derived) and duplicate rows still count") {
    // identical rows share a salt — counts must survive, and two
    // evaluations of the same plan must route rows identically (the
    // retry-safety property monotonically_increasing_id() lacked)
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("b", 3.0))
      .toDF("k", "v")
    val r1 = Skew.saltedSum(df, "k", "v", factor = 4).as[(String, Double)].collect().toMap
    val r2 = Skew.saltedSum(df, "k", "v", factor = 4).as[(String, Double)].collect().toMap
    assert(r1 == Map("a" -> 4.0, "b" -> 3.0))
    assert(r1 == r2)

    val joined = Skew.saltedJoin(df, Seq(("a", "x"), ("b", "y")).toDF("k", "name"), "k", factor = 4)
    assert(joined.count() == 4)
  }
}
