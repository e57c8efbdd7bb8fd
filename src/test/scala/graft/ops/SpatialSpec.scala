package graft.ops

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def bruteNearest(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], radius: Long): Map[Long, (Long, Long)] =
    left.flatMap { case (id, x, y) =>
      val cands = right.map { case (rid, rx, ry) =>
        (rid, (x - rx) * (x - rx) + (y - ry) * (y - ry))
      }.filter(_._2 <= radius * radius)
      if (cands.isEmpty) None
      else Some(id -> cands.minBy(c => (c._2, c._1)))
    }.toMap

  test("matches brute force on a seeded scatter incl. cell boundaries") {
    // deterministic LCG scatter; radius chosen so rings matter
    var s = 12345L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s % 2000001L) - 1000000L }
    val left = (1L to 120L).map(i => (i, nxt(), nxt()))
    val right = (1L to 60L).map(i => (i, nxt(), nxt()))
    val r = 300000L
    val got = Spatial.nearestWithin(left.toDF("id", "x", "y"),
        right.toDF("id", "x", "y"), r)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == bruteNearest(left, right, r))
  }

  test("point exactly at the radius is included (<=)") {
    val got = Spatial.nearestWithin(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        Seq((7L, 10L, 0L)).toDF("id", "x", "y"), radius = 10L)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 7L, 100L)))
  }

  test("just beyond the radius is excluded even though the cell matches") {
    val got = Spatial.nearestWithin(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        Seq((7L, 10L, 5L)).toDF("id", "x", "y"), radius = 10L)
      .as[(Long, Long, Long)].collect()
    assert(got.isEmpty)
  }

  test("tie on distance breaks to the smaller right id") {
    val got = Spatial.nearestWithin(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        Seq((9L, 5L, 0L), (3L, -5L, 0L)).toDF("id", "x", "y"), 10L)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 3L, 25L)))
  }

  test("negative coordinates cross cell zero correctly") {
    // left at (-1, -1), right at (1, 1): different grid cells, but the
    // ring must still find it
    val got = Spatial.nearestWithin(Seq((1L, -1L, -1L)).toDF("id", "x", "y"),
        Seq((2L, 1L, 1L)).toDF("id", "x", "y"), radius = 5L)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 8L)))
  }

  test("coordinate beyond ±2^40 fails loudly instead of mis-bucketing") {
    // out of the floor-division shift's valid range: the old behavior
    // silently landed the point in a wrong cell (dropping true
    // neighbors); now the job must fail with a clear message
    val bad = Spatial.nearestWithin(
      Seq((1L, Spatial.Offset + 1L, 0L)).toDF("id", "x", "y"),
      Seq((2L, 0L, 0L)).toDF("id", "x", "y"), radius = 10L)
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("out of ±2^40 range")), e.toString)
  }

  test("withinRadius returns every admissible pair exactly once") {
    val left = Seq((1L, 0L, 0L), (2L, 100L, 100L))
    val right = Seq((10L, 3L, 4L), (11L, 103L, 96L), (12L, 500L, 500L))
    val got = Spatial.withinRadius(left.toDF("id", "x", "y"),
        right.toDF("id", "x", "y"), radius = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 25L), (2L, 11L, 25L)))
  }
}
