package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  /** Three tight direction-clusters in 8d: ids 0-9 near e0, 10-19
    * near e3, 20-29 near e6. */
  private def clustered = (0 until 30).map { i =>
    val axis = (i / 10) * 3
    val v = Array.tabulate(8)(j =>
      (if (j == axis) 1.0f else 0.01f * ((i * 13 + j) % 5)))
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("k=3 picks one center per planted cluster") {
    val centers = Coreset.kCenters(clustered, "vec_id", "embedding", 3)
    assert(centers.length == 3)
    val groups = centers.map(_._1 / 10).toSet
    assert(groups == Set(0L, 1L, 2L), centers.map(_._1))
  }

  test("selection radii are non-increasing and bound the final cover") {
    val centers = Coreset.kCenters(clustered, "vec_id", "embedding", 5)
    val radii = centers.drop(1).map(_._3)
    assert(radii == radii.sorted.reverse, radii)
    val lastRadius = radii.last
    val assigned = Coreset.assign(clustered, "vec_id", "embedding", centers)
    val maxDist = assigned.agg(max("dist")).as[Double].head()
    assert(maxDist <= lastRadius + 1e-9, s"$maxDist > $lastRadius")
  }

  test("deterministic across partitionings") {
    val a = Coreset.kCenters(clustered.repartition(1), "vec_id", "embedding", 4)
    val b = Coreset.kCenters(clustered.repartition(7), "vec_id", "embedding", 4)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.map(_._3) == b.map(_._3))
  }

  test("assign keys every member to its own cluster's center") {
    val centers = Coreset.kCenters(clustered, "vec_id", "embedding", 3)
    val centerGroup = centers.map(c => c._1 -> c._1 / 10).toMap
    val assigned = Coreset.assign(clustered, "vec_id", "embedding", centers)
      .as[(Long, Long, Double)].collect()
    assert(assigned.length == 30)
    assigned.foreach { case (id, cid, _) =>
      assert(id / 10 == centerGroup(cid), s"vector $id assigned across clusters to $cid")
    }
  }

  test("k larger than the corpus returns the whole corpus as centers") {
    val tiny = (0 until 3).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val centers = Coreset.kCenters(tiny, "vec_id", "embedding", 10)
    assert(centers.map(_._1).sorted == Seq(0L, 1L, 2L))
  }
}
