package graft.ops

import graft.SparkSpec

class EcodSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], quant: Int = 1000): Map[Long, Long] =
    Ecod.depths(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      quant).as[(Long, Long)].collect().toMap

  test("1-dim hand case: middle value is deepest") {
    val d = run(Seq(1L -> Seq(1.0f), 2L -> Seq(2.0f), 3L -> Seq(3.0f)))
    assert(d == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("ties share a cell and its depth") {
    // values {1,1,2}: depth(1)=min(2,3)=2, depth(2)=min(3,1)=1
    val d = run(Seq(1L -> Seq(1.0f), 2L -> Seq(1.0f), 3L -> Seq(2.0f)))
    assert(d == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("depths sum across dimensions; planted outlier is shallowest") {
    val center = (1L to 20L).map(i => i -> Seq(0.5f, 0.5f))
    val out = Seq(99L -> Seq(9.0f, -9.0f))
    val d = run(center ++ out)
    assert(d(99L) == 2L) // tail of both dims: depth 1 + 1
    assert(d(1L) == 40L) // 20 tied centers: min(20,21)=20 per dim
  }

  test("negative values quantize on the floor grid consistently") {
    // -0.0004 and -0.0006 land in cell -1; 0.0004 in cell 0
    val d = run(Seq(1L -> Seq(-0.0004f), 2L -> Seq(-0.0006f),
      3L -> Seq(0.0004f)))
    assert(d(1L) == d(2L))
    assert(d(3L) == 1L)
  }

  test("deterministic across partitionings") {
    val vecs = (1L to 50L).map(i =>
      i -> Seq((i % 7).toFloat / 7f, (i % 11).toFloat / 11f, i.toFloat / 50f))
    val a = Ecod.depths(vecs.toDF("vec_id", "embedding").repartition(1),
      "vec_id", "embedding", 1000).as[(Long, Long)].collect().toMap
    val b = Ecod.depths(vecs.toDF("vec_id", "embedding").repartition(7),
      "vec_id", "embedding", 1000).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("coarse quant collapses everything to one cell") {
    val d = run(Seq(1L -> Seq(0.1f), 2L -> Seq(0.2f), 3L -> Seq(0.3f)),
      quant = 1)
    assert(d.values.toSet == Set(3L)) // all tied: depth = n
  }
}
