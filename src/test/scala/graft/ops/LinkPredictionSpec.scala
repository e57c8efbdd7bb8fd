package graft.ops

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxDeg: Option[Long] = None) =
    LinkPrediction.adamicAdar(edges.toDF("src", "dst"), maxDeg)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("hand case: rare shared neighbor outweighs a popular one") {
    // w1 links {10,11} (deg 2); w2 links {10,11,12,13} (deg 4).
    // pair (10,11) shares both; (12,13) only the popular w2.
    val edges = Seq((1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L))
    val m = run(edges)
    val t2 = math.round(1000000.0 / math.log(2.0))
    val t4 = math.round(1000000.0 / math.log(4.0))
    assert(m((10L, 11L)) == ((t2 + t4, 2L)))
    assert(m((12L, 13L)) == ((t4, 1L)))
    assert(m((10L, 11L))._1 > m((12L, 13L))._1)
  }

  test("degree-1 neighbors contribute nothing (no wedge, no ln(1))") {
    val m = run(Seq((1L, 10L), (2L, 10L), (2L, 11L)))
    assert(m.keySet == Set((10L, 11L)))
  }

  test("duplicate edges dedupe before degrees") {
    val m1 = run(Seq((1L, 10L), (1L, 10L), (1L, 11L)))
    val m2 = run(Seq((1L, 10L), (1L, 11L)))
    assert(m1 == m2)
  }

  test("maxDeg excludes hub neighbors entirely") {
    val hub = (10L to 20L).map(s => (99L, s))
    val m = run(Seq((1L, 10L), (1L, 11L)) ++ hub, maxDeg = Some(5L))
    assert(m.keySet == Set((10L, 11L)))
    assert(m((10L, 11L))._2 == 1L)
  }

  test("deterministic across partitionings") {
    val edges = (1L to 200L).map(i => (i % 17, i % 23))
    val a = LinkPrediction.adamicAdar(edges.toDF("src", "dst").repartition(1))
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = LinkPrediction.adamicAdar(edges.toDF("src", "dst").repartition(7))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
