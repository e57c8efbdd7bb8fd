package graft.ops

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("one round: hand-computed max-normalized scores") {
    // h1→{a1,a2}, h2→a1: a(a1)=2e12→norm 1e12, a(a2)=1e12→5e11;
    // h(h1)=1.5e12→norm 1e12, h(h2)=1e12→(1e24 div 1.5e12)
    val e = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1")).toDF("src", "dst")
    val m = Hits.scores(e, iters = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("a1") == ((0L, 1000000000000L)))
    assert(m("a2") == ((0L, 500000000000L)))
    assert(m("h1") == ((1000000000000L, 0L)))
    assert(m("h2") == ((666666666666L, 0L)))
  }

  test("hubs and authorities separate on a bipartite purchase graph") {
    // B1 buys from all three sellers, B2 from S1 only: B1 is the top
    // hub, S1 (bought by both) the top authority; sides never mix
    val e = Seq(("B1", "S1"), ("B1", "S2"), ("B1", "S3"), ("B2", "S1"))
      .toDF("src", "dst")
    val m = Hits.scores(e, iters = 4).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("B1")._1 == 1000000000000L && m("B1")._2 == 0L)
    assert(m("B2")._1 > 0L && m("B2")._1 < m("B1")._1)
    assert(m("S1")._2 == 1000000000000L && m("S1")._1 == 0L)
    assert(m("S2")._2 > 0L && m("S2")._2 < m("S1")._2)
    assert(m("S2") == m("S3"))
  }

  test("duplicate edges collapse; deterministic across partitionings") {
    val base = (1 to 200).map(i => (s"u${i % 20}", s"v${i % 31}"))
    val e = (base ++ base.take(50)).toDF("src", "dst")
    def go(parts: Int) = Hits.scores(e.repartition(parts), iters = 3)
      .orderBy("node").collect().toSeq
    assert(go(1) == go(7))
  }
}
