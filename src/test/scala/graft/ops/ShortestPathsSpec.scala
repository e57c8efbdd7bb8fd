package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
      hops: Int): Map[Long, Long] =
    ShortestPaths.bounded(edges.toDF("src", "dst", "w"),
        sources.toDF("node"), maxHops = hops)
      .as[(Long, Long)].collect().toMap

  test("line graph: hop bound truncates the reach") {
    val line = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 4L, 10L),
      (4L, 5L, 10L))
    assert(run(line, Seq(1L), 2) == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
    assert(run(line, Seq(1L), 4) ==
      Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 30L, 5L -> 40L))
  }

  test("cheaper long path beats expensive direct edge within the bound") {
    // direct 1→4 costs 100; 1→2→3→4 costs 30 but needs 3 hops
    val g = Seq((1L, 4L, 100L), (1L, 2L, 10L), (2L, 3L, 10L),
      (3L, 4L, 10L))
    assert(run(g, Seq(1L), 1)(4L) == 100L)
    assert(run(g, Seq(1L), 3)(4L) == 30L)
  }

  test("multi-source takes the min over sources") {
    val g = Seq((1L, 3L, 5L), (2L, 3L, 2L), (3L, 4L, 1L))
    val d = run(g, Seq(1L, 2L), 2)
    assert(d(3L) == 2L && d(4L) == 3L && d(1L) == 0L && d(2L) == 0L)
  }

  test("early exit: diameter-2 graph with maxHops=10 settles") {
    val g = Seq((1L, 2L, 1L), (2L, 3L, 1L))
    assert(run(g, Seq(1L), 10) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("deterministic across partitionings") {
    val g = (1L to 40L).flatMap(i => Seq((i, i % 7 + 100L, i % 5 + 1L),
      (i % 7 + 100L, i, 3L)))
    val a = ShortestPaths.bounded(g.toDF("src", "dst", "w").repartition(1),
      Seq(1L, 2L).toDF("node"), 3).as[(Long, Long)].collect().toMap
    val b = ShortestPaths.bounded(g.toDF("src", "dst", "w").repartition(7),
      Seq(1L, 2L).toDF("node"), 3).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("negative weight rejected") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L, -1L)), Seq(1L), 2)
    }
  }

  test("unreachable nodes are absent; zero-weight edges fine") {
    val d = run(Seq((1L, 2L, 0L), (5L, 6L, 1L)), Seq(1L), 3)
    assert(d == Map(1L -> 0L, 2L -> 0L))
  }
}
