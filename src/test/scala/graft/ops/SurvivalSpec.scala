package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)]): Seq[Row] =
    Survival.kaplanMeier(rows.toDF("dur", "ev"), "dur", "ev")
      .orderBy("t").collect().toSeq

  test("textbook KM: events at 2 and 4, censor at 3") {
    // subjects: d=2 event, d=3 censored, d=4 event, d=5 censored
    // t=2: n=4, d=1 -> S = 3/4; t=3: censor only, S stays;
    // t=4: n=2, d=1 -> S = 3/4 * 1/2 = 3/8; t=5: censor
    val r = run(Seq((2L, true), (3L, false), (4L, true), (5L, false)))
    val byT = r.map(x => x.getLong(0) -> x).toMap
    assert(byT(2L).getLong(1) == 4L && byT(2L).getLong(2) == 1L)
    assert(math.abs(byT(2L).getDouble(5) - 0.75) < 1e-5)
    assert(math.abs(byT(3L).getDouble(5) - 0.75) < 1e-5)
    assert(byT(4L).getLong(1) == 2L)
    assert(math.abs(byT(4L).getDouble(5) - 0.375) < 1e-5)
    // exact integer hazard: 1/4 + 1/2 = 0.75 -> 750000000
    assert(byT(4L).getLong(4) == 250000000L + 500000000L)
  }

  test("no censoring: survival steps down to exactly zero") {
    val r = run(Seq((1L, true), (2L, true), (3L, true)))
    assert(math.abs(r.head.getDouble(5) - 2.0 / 3.0) < 1e-5)
    assert(r.last.getDouble(5) == 0.0)
  }

  test("all censored: survival stays 1, hazard stays 0") {
    val r = run(Seq((1L, false), (2L, false)))
    assert(r.forall(_.getDouble(5) == 1.0))
    assert(r.forall(_.getLong(4) == 0L))
  }

  test("ties at one duration fold into a single life-table row") {
    val r = run(Seq((2L, true), (2L, true), (2L, false), (5L, true)))
    val t2 = r.find(_.getLong(0) == 2L).get
    assert(t2.getLong(1) == 4L && t2.getLong(2) == 2L && t2.getLong(3) == 1L)
    assert(math.abs(t2.getDouble(5) - 0.5) < 1e-5)
  }

  test("deterministic across partitionings") {
    val rows = (1 to 200).map(i => ((i % 17).toLong, i % 3 != 0))
    val a = Survival.kaplanMeier(rows.toDF("dur", "ev").repartition(1),
      "dur", "ev").orderBy("t").collect().toSeq
    val b = Survival.kaplanMeier(rows.toDF("dur", "ev").repartition(7),
      "dur", "ev").orderBy("t").collect().toSeq
    assert(a == b)
  }
}
