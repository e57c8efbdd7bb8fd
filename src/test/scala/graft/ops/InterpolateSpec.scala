package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: grid values linearly between bracketing observations") {
    // key 1: obs at t=5 (v=10.0) and t=25 (v=30.0), step 10 →
    // grid {10, 20}: v(10) = 10 + 20*(5/20) = 15; v(20) = 25
    val obs = Seq((1L, 5L, 10.0), (1L, 25L, 30.0)).toDF("k", "t", "v")
    val out = Interpolate.resampleLinear(obs, "k", "t", "v", step = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 10L, 15.0), (1L, 20L, 25.0)), out)
  }

  test("grid point exactly on an observation takes its value") {
    val obs = Seq((1L, 0L, 2.0), (1L, 10L, 8.0), (1L, 20L, 4.0))
      .toDF("k", "t", "v")
    val out = Interpolate.resampleLinear(obs, "k", "t", "v", step = 10)
      .as[(Long, Long, Double)].collect().toMap2
    assert(out((1L, 10L)) == 8.0 && out((1L, 20L)) == 4.0, out)
  }

  test("sub-step spans yield no grid rows; null values are ignored") {
    val obs = Seq(
      (1L, 3L, Some(1.0)), (1L, 7L, Some(2.0)),       // span < step
      (2L, 5L, Some(0.0)), (2L, 15L, None), (2L, 25L, Some(10.0)))
      .toDF("k", "t", "v")
    val out = Interpolate.resampleLinear(obs, "k", "t", "v", step = 10)
      .as[(Long, Long, Double)].collect().toSet
    // key 2: null at 15 ignored → grid {10, 20} interpolates 5→25
    assert(out == Set((2L, 10L, 2.5), (2L, 20L, 7.5)), out)
  }

  test("both neighbor carries run in ONE window exec (single sort, one shuffle)") {
    val obs = Seq((1L, 5L, 10.0), (1L, 25L, 30.0)).toDF("k", "t", "v")
    val plan = Interpolate.resampleLinear(obs, "k", "t", "v", step = 10)
      .queryExecution.executedPlan.toString
    // Spark splits the two frames into two WindowExecs, but they must
    // share ONE sort; shuffles = the window partitioning + the grid's
    // tiny min/max aggregation, nothing more
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts == 1 && exchanges <= 2,
      s"expected one shared sort (<=2 exchanges), got $exchanges/$sorts:\n$plan")
  }

  private implicit class MapOps(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
