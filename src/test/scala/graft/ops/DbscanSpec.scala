package graft.ops

import graft.SparkSpec

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // blob A (ids 1-4) at the origin, blob B (ids 11-14) at (100,100),
  // border point 21 near A, noise point 31 far from everything
  private def pts = Seq(
    (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
    (11L, 100L, 100L), (12L, 101L, 100L), (13L, 100L, 101L),
    (14L, 101L, 101L),
    (21L, 3L, 0L),
    (31L, 50L, 50L)
  ).toDF("id", "x", "y")

  private def run(eps: Long, minPts: Int) =
    Dbscan.cluster(pts, eps, minPts).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toMap

  test("two blobs, one border, one noise — textbook roles") {
    val m = run(eps = 2, minPts = 3)
    // blob members are cores of their component (cluster = min core id)
    for (i <- Seq(1L, 2L, 3L, 4L)) assert(m(i) == ((1L, "core")), s"$i: ${m(i)}")
    for (i <- Seq(11L, 12L, 13L, 14L)) assert(m(i) == ((11L, "core")), s"$i")
    // 21 is within eps only of core 2 (d²=4): 2 neighbors < minPts →
    // border, inheriting A's cluster
    assert(m(21L) == ((1L, "border")))
    assert(m(31L) == ((-1L, "noise")))
  }

  test("minPts=1 makes every point a singleton-or-better core; no noise") {
    val m = run(eps = 2, minPts = 1)
    assert(m.values.forall(_._2 == "core"))
    assert(m(31L) == ((31L, "core"))) // isolated: its own cluster
  }

  test("eps too small: everything is noise at minPts 3") {
    val m = run(eps = 1, minPts = 4)
    assert(m.values.forall(_._2 == "noise"), m.toString)
  }

  test("border touching two clusters joins the smallest CLUSTER id") {
    // 1-D line, eps=2, minPts=4. Cluster A = cores {1,8}@0, 9@1, 10@2
    // (cluster id 1); cluster B = cores 6@6, 5@7, {3,4}@8 (cluster
    // id 3). Border 20@4 has only 3 ε-neighbors (itself, 10, 6) →
    // non-core, and its core-neighbors are 10 (cluster 1) and 6
    // (cluster 3). The pinned rule is min over CLUSTER ids → 1. The
    // rejected alternative — "smallest core-neighbor's cluster" —
    // would pick core 6's cluster 3; this case separates them.
    val p = Seq(
      (1L, 0L, 0L), (8L, 0L, 0L), (9L, 1L, 0L), (10L, 2L, 0L),
      (3L, 8L, 0L), (4L, 8L, 0L), (5L, 7L, 0L), (6L, 6L, 0L),
      (20L, 4L, 0L)
    ).toDF("id", "x", "y")
    val m = Dbscan.cluster(p, eps = 2, minPts = 4).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toMap
    for (i <- Seq(1L, 8L, 9L, 10L)) assert(m(i) == ((1L, "core")), s"$i")
    for (i <- Seq(3L, 4L, 5L, 6L)) assert(m(i) == ((3L, "core")), s"$i")
    assert(m(20L) == ((1L, "border")), m(20L).toString)
  }

  test("deterministic across partitionings") {
    val big = (1 to 400).map { i =>
      val blob = i % 8
      (i.toLong, blob * 1000L + i % 5, blob * 1000L + (i * 3) % 5)
    }.toDF("id", "x", "y")
    def go(parts: Int) = Dbscan.cluster(big.repartition(parts), 10, 4)
      .orderBy("id").collect().toSeq
    assert(go(1) == go(7))
  }
}
