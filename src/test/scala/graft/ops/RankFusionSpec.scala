package graft.ops

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def fuse(lists: Seq[Seq[(Long, Long)]], topN: Int = 1000,
      k: Int = 60): Map[Long, (Long, Long)] =
    RankFusion.rrf(lists.map(_.toDF("id", "score")), "id", "score",
        topN, k)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("hand-computed two-list fusion") {
    // list A ranks: 1,2,3; list B ranks: 3,2,1 (k=0 for round numbers)
    val m = fuse(Seq(
      Seq((1L, 30L), (2L, 20L), (3L, 10L)),
      Seq((3L, 9L), (2L, 6L), (1L, 3L))), k = 0)
    val s = 1000000000L
    assert(m(1L) == ((s / 1 + s / 3, 2L)))
    assert(m(2L) == ((s / 2 + s / 2, 2L)))
    assert(m(3L) == ((s / 3 + s / 1, 2L)))
  }

  test("consensus beats a single first place (classic RRF property)") {
    // item 10 is 2nd in all three lists; items 1,2,3 are each 1st once
    // and absent elsewhere
    val lists = Seq(
      Seq((1L, 100L), (10L, 90L)),
      Seq((2L, 100L), (10L, 90L)),
      Seq((3L, 100L), (10L, 90L)))
    val m = fuse(lists)
    assert(m(10L)._1 > m(1L)._1)
    assert(m(10L)._2 == 3L && m(1L)._2 == 1L)
  }

  test("topN cuts the tail before ranking") {
    val m = fuse(Seq((1L to 50L).map(i => (i, 1000L - i))), topN = 10)
    assert(m.size == 10)
    assert(m.contains(1L) && !m.contains(11L))
  }

  test("score ties rank by id ascending") {
    val m = fuse(Seq(Seq((5L, 10L), (2L, 10L), (9L, 10L))), k = 0)
    val s = 1000000000L
    assert(m(2L)._1 == s / 1 && m(5L)._1 == s / 2 && m(9L)._1 == s / 3)
  }

  test("deterministic across partitionings") {
    val a = (1L to 200L).map(i => (i, (i * 37) % 101))
    val b = (1L to 200L).map(i => (i, (i * 53) % 97))
    val r1 = RankFusion.rrf(Seq(a.toDF("id", "score").repartition(1),
      b.toDF("id", "score").repartition(1)), "id", "score", 100, 60)
      .as[(Long, Long, Long)].collect().toSet
    val r2 = RankFusion.rrf(Seq(a.toDF("id", "score").repartition(7),
      b.toDF("id", "score").repartition(3)), "id", "score", 100, 60)
      .as[(Long, Long, Long)].collect().toSet
    assert(r1 == r2)
  }
}
