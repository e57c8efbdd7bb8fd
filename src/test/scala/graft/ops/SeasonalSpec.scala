package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("pure seasonal signal: phases recover their offsets, residual ~0") {
    // period 4, constant level 100 with per-phase offsets {0,20,-20,0};
    // offsets sum to 0 so the centered MA stays ~flat mid-series
    val offs = Seq(0L, 20L, -20L, 0L)
    val rows = (0 until 40).map(i => ("a", i.toLong, 100L + offs(i % 4)))
    val d = Seasonal.decompose(rows.toDF("k", "t", "v"), "k", "t", "v", 4)
      .collect()
    val mid = d.filter(r => r.getLong(1) >= 4 && r.getLong(1) < 36)
    // per-phase seasonal indices should separate cleanly in the middle
    val byPhase = mid.groupBy(_.getInt(3)).map { case (p, rs) =>
      p -> rs.map(_.getLong(5)).distinct
    }
    assert(byPhase(1L.toInt).forall(_ > 10), byPhase.toString)
    assert(byPhase(2L.toInt).forall(_ < -10), byPhase.toString)
    assert(mid.forall(r => math.abs(r.getLong(6)) <= 6),
      "mid-series residuals should be near zero")
  }

  test("trend + seasonal + residual always reconstruct the value exactly") {
    val rows = (0 until 60).map(i =>
      ("a", i.toLong, 50L + i * 3 + (i % 7) * 11 + (i * 13 % 5)))
    val d = Seasonal.decompose(rows.toDF("k", "t", "v"), "k", "t", "v", 7)
      .collect()
    d.foreach { r =>
      assert(r.getLong(2) == r.getLong(4) + r.getLong(5) + r.getLong(6),
        s"row $r must reconstruct")
    }
  }

  test("rising trend is tracked by the centered MA") {
    val rows = (0 until 30).map(i => ("a", i.toLong, 1000L * i))
    val d = Seasonal.decompose(rows.toDF("k", "t", "v"), "k", "t", "v", 6)
      .collect().sortBy(_.getLong(1))
    val trends = d.map(_.getLong(4))
    assert(trends.zip(trends.tail).forall { case (a, b) => a < b })
  }

  test("phase summary grain and determinism across partitionings") {
    val rows = (0 until 70).map(i =>
      ((i % 2).toString, i.toLong, (i * 17 % 101).toLong))
    val a = Seasonal.phaseSummary(rows.toDF("k", "t", "v").repartition(1),
      "k", "t", "v", 7).orderBy("key", "phase").collect().toSeq
    val b = Seasonal.phaseSummary(rows.toDF("k", "t", "v").repartition(7),
      "k", "t", "v", 7).orderBy("key", "phase").collect().toSeq
    assert(a == b)
    assert(a.map(r => (r.getString(0), r.getInt(1))).distinct.size == a.size)
  }
}
