package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chains, clumps and singletons resolve to min-id components") {
    val m = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),          // chain → 1
      (10L, 11L), (11L, 12L), (10L, 12L),    // triangle → 10
      (20L, 20L)))                           // self-loop singleton → 20
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("long path needs diameter rounds and still converges") {
    val n = 32L
    val m = cc((0L until n - 1).map(i => (i, i + 1)))
    assert(m.size === n)
    assert(m.values.forall(_ == 0L))
  }

  test("near-dup pairs close transitively into clusters") {
    // A~B and B~C but never A~C: pair output from banded minhash can
    // miss the far pair; components must still unite them
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // ~1
      (3L, "alpha beta gamma delta epsilon zeta nu iota"),    // ~2
      (50L, "completely unrelated content about other things entirely")
    ).toDF("doc_id", "text")
    val pairs = Similarity.ngramJaccard(docs, "doc_id", "text", k = 3, threshold = 0.3)
      .select(col("id1").as("src"), col("id2").as("dst"))
    val comps = ConnectedComponents.components(
        pairs.union(docs.select(col("doc_id").as("src"), col("doc_id").as("dst"))))
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(50L) === 50L)
  }
}
