package graft.ops

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  test("assortativity: hand-computed Pearson over endpoint degrees") {
    // src a has out-degree 2, b has 1; dst x in-degree 2, y in-degree 1
    // edges (a,x),(a,y),(b,x): (dx,dy) pairs (2,2),(2,1),(1,2)
    // m=3 sx=5 sy=5 sxx=9 syy=9 sxy=8 →
    // num = 24-25 = -1; dx=dy = 27-25 = 2 → r = -1/2 = -0.5
    val e = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(e).collect()(0)
    assert(r.getLong(0) == 3)
    assert(r.getDouble(1) == -0.5)
  }

  test("perfectly assortative graph: hubs to hubs gives r = 1") {
    // two disconnected components of different regular degree: every
    // edge joins equal-degree endpoints with two distinct degree
    // levels → Pearson exactly 1
    val hub = for (i <- 1 to 3; j <- 1 to 3) yield (s"h$i", s"H$j")
    val leaf = Seq(("l1", "L1"))
    val e = (hub ++ leaf).toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(e).collect()(0)
    assert(r.getLong(0) == 10)
    assert(r.getDouble(1) == 1.0)
  }

  test("degenerate regular graph yields NULL, duplicate edges collapse") {
    val e = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(e).collect()(0)
    assert(r.getLong(0) == 2)
    assert(r.isNullAt(1))
  }

  test("deterministic across partitionings") {
    val e = (1 to 200).map(i => (s"s${i % 17}", s"d${i % 23}"))
      .toDF("src", "dst")
    val a = GraphStats.degreeAssortativity(e.repartition(1)).collect()(0)
    val b = GraphStats.degreeAssortativity(e.repartition(7)).collect()(0)
    assert(a == b)
  }
}
