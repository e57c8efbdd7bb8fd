package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def undirected(pairs: (String, String)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("star graph: the hub out-ranks every leaf; leaves tie exactly") {
    val star = undirected((2 to 11).map(i => ("hub", s"leaf$i")): _*)
    val r = PageRank.ranks(star, iters = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val hub = r("hub")
    val leaves = (2 to 11).map(i => r(s"leaf$i"))
    assert(leaves.distinct.size === 1, "symmetric leaves must tie")
    assert(hub > leaves.head * 5, s"hub $hub vs leaf ${leaves.head}")
    // mass stays in (0.5, 1.0] x 10^12: truncation only loses dust
    val total = r.values.sum
    assert(total > 500000000000L && total <= 1000000000000L, total)
  }

  test("deterministic across runs and partitionings") {
    val g = undirected(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
    val r1 = PageRank.ranks(g, iters = 4).orderBy("node").collect().toSeq
    val r2 = PageRank.ranks(g.repartition(7), iters = 4)
      .orderBy("node").collect().toSeq
    assert(r1 === r2)
  }

  test("dangling nodes keep base rank only; sinks accumulate") {
    // directed chain a -> b -> c: c is dangling (drops mass), a gets
    // nothing back
    val chain = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r = PageRank.ranks(chain, iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("c") > r("b") && r("b") > r("a"))
  }

  test("periodic checkpointing bounds the plan, not the result") {
    val g = undirected(("a", "b"), ("b", "c"), ("c", "a"))
    val checked = PageRank.ranks(g, iters = 6, checkpointEvery = 2)
    val unchecked = PageRank.ranks(g, iters = 6, checkpointEvery = 0)
    assert(checked.orderBy("node").collect().toSeq
      === unchecked.orderBy("node").collect().toSeq)
    def planSize(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.logical.collect { case n => n }.size
    assert(planSize(checked) < planSize(unchecked),
      s"${planSize(checked)} !< ${planSize(unchecked)}")
  }
}
