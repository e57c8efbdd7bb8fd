package graft.ops

import graft.SparkSpec

class JoinEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("union smaller than k: exact intersection") {
    val a = (1L to 50L).toDF("k")
    val b = (26L to 80L).toDF("k")
    val r = JoinEstimate.overlap(a, "k", b, "k", k = 256)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 == 80L) // union fits
    assert(r._2 == 25L && r._4 == 25L) // exact
  }

  test("estimate lands within KMV error on a large overlap") {
    val a = (1L to 20000L).toDF("k")
    val b = (10001L to 30000L).toDF("k") // true intersection 10000
    val r = JoinEstimate.overlap(a, "k", b, "k", k = 512)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 == 512L)
    // ±3/sqrt(k) ~ 13% tolerance on the 10000 truth
    assert(math.abs(r._4 - 10000L) < 2000L, s"est ${r._4}")
  }

  test("disjoint sets estimate zero") {
    val a = (1L to 5000L).toDF("k")
    val b = (100001L to 105000L).toDF("k")
    val r = JoinEstimate.overlap(a, "k", b, "k", k = 128)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._2 == 0L && r._4 == 0L)
  }

  test("duplicate keys do not bias the distinct estimate") {
    val a = ((1L to 100L) ++ (1L to 100L) ++ (1L to 100L)).toDF("k")
    val b = (51L to 150L).toDF("k")
    val r = JoinEstimate.overlap(a, "k", b, "k", k = 512)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._4 == 50L) // union 150 < k: exact despite dup inputs
  }

  test("deterministic across partitionings") {
    val a = (1L to 3000L).toDF("k")
    val b = (1500L to 4500L).toDF("k")
    val r1 = JoinEstimate.overlap(a.repartition(1), "k", b, "k", 64)
      .as[(Long, Long, Long, Long)].collect().head
    val r2 = JoinEstimate.overlap(a.repartition(7), "k",
      b.repartition(3), "k", 64)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r1 == r2)
  }
}
