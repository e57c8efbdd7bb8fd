package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r20 parity pins: the bounded driver folds of the iterative graph
  * operators must reproduce the distributed rounds BIT-FOR-BIT — same
  * integral arithmetic edge by edge, so any divergence is a fold bug.
  * The graph mixes hubs, chains, duplicate edges, dangling nodes and
  * string ids (the co-purchase entries' shape).
  */
class GraphDriverFoldSpec extends SparkSpec {
  import spark.implicits._

  // hashed pseudo-random digraph with duplicates and a hub
  private lazy val edges = ((0 until 600).map { i =>
    val s = (i * 2654435761L) % 83
    val d = (i * 40503L + 7) % 83
    (s"n$s", s"n$d")
  } ++ Seq(("n1", "hub"), ("n2", "hub"), ("n3", "hub"), ("n1", "hub")))
    .toDF("src", "dst")

  private def m(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.getLong).toSeq).toMap

  test("PageRank.ranks: fold == distributed") {
    val fold = m(PageRank.ranks(edges, iters = 4))
    val dist = m(PageRank.ranks(edges, iters = 4, driverFoldEdges = 0L))
    assert(fold == dist)
  }

  test("PageRank.personalized: fold == distributed") {
    val sources = Seq("n1", "n5", "absent").toDF("node")
    val fold = m(PageRank.personalized(edges, sources, iters = 3))
    val dist = m(PageRank.personalized(edges, sources, iters = 3,
      driverFoldEdges = 0L))
    assert(fold == dist)
  }

  test("Hits.scores: fold == distributed") {
    val fold = m(Hits.scores(edges, iters = 4))
    val dist = m(Hits.scores(edges, iters = 4, driverFoldEdges = 0L))
    assert(fold == dist)
  }

  test("ShortestPaths.bounded: fold == distributed") {
    val w = edges.withColumn("w",
      pmod(xxhash64(col("src"), col("dst")), lit(50L)))
    val sources = Seq("n1", "n2").toDF("node")
    val fold = m(ShortestPaths.bounded(w, sources, maxHops = 4))
    val dist = m(ShortestPaths.bounded(w, sources, maxHops = 4,
      driverFoldEdges = 0L))
    assert(fold == dist)
  }
}
