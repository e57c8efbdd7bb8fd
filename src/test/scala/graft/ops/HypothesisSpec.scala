package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  private def welch(rows: Seq[(Boolean, Long)]): Row =
    Hypothesis.welchZ(rows.toDF("grp", "v"), "grp", "v").collect()(0)

  private def mw(rows: Seq[(Boolean, Long)]): Row =
    Hypothesis.mannWhitney(rows.toDF("grp", "v"), "grp", "v").collect()(0)

  test("welch: replicated formula on a hand sample") {
    val a = Seq(10L, 12L, 14L, 16L); val b = Seq(20L, 22L, 24L, 26L, 28L)
    val r = welch(a.map((true, _)) ++ b.map((false, _)))
    def stats(xs: Seq[Long]) = {
      val n = xs.size.toDouble; val m = xs.sum.toDouble / n
      val v = (n * xs.map(x => x * x).sum - math.pow(xs.sum.toDouble, 2)) /
        (n * (n - 1))
      (n, m, v)
    }
    val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
    val z = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 13.0 && r.getDouble(3) == 24.0)
    assert(math.abs(r.getDouble(4) - z) < 1e-5, s"${r.getDouble(4)} vs $z")
  }

  test("welch: identical groups give z near 0; constant sides give NULL") {
    val same = (1 to 50).flatMap(i => Seq((true, (i % 7).toLong),
      (false, (i % 7).toLong)))
    assert(math.abs(welch(same).getDouble(4)) < 1e-9)
    val const = Seq((true, 5L), (true, 5L), (false, 5L), (false, 5L))
    assert(welch(const).isNullAt(4))
  }

  test("mann-whitney: textbook no-tie example") {
    // A = {1,2,3}, B = {4,5,6}: ranks of A = 1,2,3, R_A = 6,
    // U_A = 6 - 6 = 0 → u2 = 0; complete separation
    val r = mw(Seq((true, 1L), (true, 2L), (true, 3L),
      (false, 4L), (false, 5L), (false, 6L)))
    assert(r.getLong(2) == 0L, s"u2 ${r.getLong(2)}")
    assert(r.getDouble(3) < -1.9) // z = -4.5/sqrt(5.25) ~ -1.96
  }

  test("mann-whitney: ties get average ranks (doubled stays exact)") {
    // A = {1,2}, B = {2,3}: ranks 1, 2.5, 2.5, 4 → R_A = 3.5 → U_A = 0.5
    // u2 = 2*U_A = 1
    val r = mw(Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L)))
    assert(r.getLong(2) == 1L, s"u2 ${r.getLong(2)}")
  }

  test("mann-whitney: identical distributions give z near 0; all-tied NULL") {
    val same = (1 to 60).map(i => (i % 2 == 0, (i % 5).toLong))
    assert(math.abs(mw(same).getDouble(3)) < 0.3)
    val tied = Seq((true, 7L), (true, 7L), (false, 7L))
    assert(mw(tied).isNullAt(3))
  }

  test("chi-squared: hand-computed 2x2 table") {
    // table: a1 {x:30, y:10}, a2 {x:10, y:30} -> chi2 = 20, V = 0.5
    val rows = Seq.fill(30)(("a1", "x")) ++ Seq.fill(10)(("a1", "y")) ++
      Seq.fill(10)(("a2", "x")) ++ Seq.fill(30)(("a2", "y"))
    val r = Hypothesis.chiSquared(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r.getLong(0) == 80L && r.getLong(3) == 1L)
    assert(math.abs(r.getLong(4) / 1e9 - 20.0) < 1e-6, s"chi2 ${r.getLong(4)}")
    assert(r.getDouble(5) == 0.5, s"V ${r.getDouble(5)}")
  }

  test("chi-squared: perfectly independent table scores ~0") {
    val rows = for {a <- Seq("a1", "a2", "a3"); b <- Seq("x", "y")
      ; _ <- 1 to 10} yield (a, b)
    val r = Hypothesis.chiSquared(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert(r.getLong(4) == 0L && r.getDouble(5) == 0.0)
    assert(r.getLong(3) == 2L)
  }

  test("deterministic across partitionings") {
    val rows = (1 to 300).map(i => (i % 3 == 0, (i * 13 % 41).toLong))
    val a1 = Hypothesis.mannWhitney(rows.toDF("grp", "v").repartition(1),
      "grp", "v").collect()(0)
    val a2 = Hypothesis.mannWhitney(rows.toDF("grp", "v").repartition(7),
      "grp", "v").collect()(0)
    assert(a1 == a2)
    val b1 = Hypothesis.welchZ(rows.toDF("grp", "v").repartition(1),
      "grp", "v").collect()(0)
    val b2 = Hypothesis.welchZ(rows.toDF("grp", "v").repartition(7),
      "grp", "v").collect()(0)
    assert(b1 == b2)
    val cr = (1 to 300).map(i => ((i % 4).toString, (i % 7).toString))
    val c1 = Hypothesis.chiSquared(cr.toDF("a", "b").repartition(1),
      "a", "b").collect()(0)
    val c2 = Hypothesis.chiSquared(cr.toDF("a", "b").repartition(9),
      "a", "b").collect()(0)
    assert(c1 == c2)
  }

  test("kruskal-wallis: textbook no-tie hand case H = 2.4") {
    import spark.implicits._
    // g1={1,2} g2={3,4}: ranks 1..4, R=(3,7) →
    // H = 12/20·(9/2+49/2) − 15 = 2.4, no tie correction
    val df = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L))
      .toDF("g", "v")
    val r = Hypothesis.kruskalWallis(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("k") == 2)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-5, r.toString)
  }

  test("kruskal-wallis: identical distributions give near-zero H; separation grows it") {
    import spark.implicits._
    val same = (1 to 90).map(i => (s"g${i % 3}", (i / 3).toLong))
      .toDF("g", "v")
    val hSame = Hypothesis.kruskalWallis(same, "g", "v")
      .collect()(0).getAs[Double]("h")
    assert(hSame < 1.0, s"identical: $hSame")
    val apart = (1 to 90).map(i => (s"g${i % 3}", (i % 3) * 1000L + i))
      .toDF("g", "v")
    val hApart = Hypothesis.kruskalWallis(apart, "g", "v")
      .collect()(0).getAs[Double]("h")
    assert(hApart > 50.0, s"separated: $hApart")
  }

  test("kruskal-wallis: degenerate cases are NULL") {
    import spark.implicits._
    // all values tie → correction 0
    val allTie = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val r1 = Hypothesis.kruskalWallis(allTie, "g", "v").collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("h")))
    // single group → k < 2
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r2 = Hypothesis.kruskalWallis(one, "g", "v").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("h")))
  }

  test("kruskal-wallis deterministic across partitionings") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 4}", (i * 13 % 83).toLong))
      .toDF("g", "v")
    val a = Hypothesis.kruskalWallis(df.repartition(1), "g", "v").collect()(0)
    val b = Hypothesis.kruskalWallis(df.repartition(7), "g", "v").collect()(0)
    assert(a == b)
  }
}
