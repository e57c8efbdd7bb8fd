package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def recs = (0 until 400).map(i =>
    (i.toLong, s"g${i % 20}", (i % 7) * 100.0)).toDF("id", "grp", "amt")

  test("release is bit-deterministic across runs and partitionings") {
    val a = DpRelease.dpCounts(recs.repartition(1), Seq("grp"), 1.0, "s1")
      .select("grp", "released").as[(String, Double)].collect().toMap
    val b = DpRelease.dpCounts(recs.repartition(13), Seq("grp"), 1.0, "s1")
      .select("grp", "released").as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("different seeds give different noise; same seed reproduces") {
    val a = DpRelease.dpCounts(recs, Seq("grp"), 1.0, "s1")
      .select("released").as[Double].collect().toSeq
    val b = DpRelease.dpCounts(recs, Seq("grp"), 1.0, "s2")
      .select("released").as[Double].collect().toSeq
    assert(a.toSet != b.toSet)
  }

  test("noise magnitude tracks the 1/epsilon scale") {
    // 20 groups of 20: mean |released - n| should be ~scale (Laplace
    // mean abs = b); loose band, deterministic seed
    def meanAbs(eps: Double) = DpRelease.dpCounts(recs, Seq("grp"), eps, "s")
      .select(abs(col("released") - col("n"))).as[Double].collect().sum / 20
    val tight = meanAbs(10.0) // b = 0.1
    val loose = meanAbs(0.2)  // b = 5
    assert(tight < 1.0, s"tight=$tight")
    assert(loose > tight * 5, s"loose=$loose tight=$tight")
  }

  test("count release never goes negative") {
    // epsilon tiny → scale huge → raw noise often below -n; clamp holds
    val rel = DpRelease.dpCounts(recs, Seq("grp"), 0.001, "s")
      .select("released").as[Double].collect()
    assert(rel.forall(_ >= 0.0), rel.toSeq)
  }

  test("dpSums clamps per-row contributions to the declared bounds") {
    val withOutlier = recs.unionByName(
      Seq((9999L, "g0", 1e9)).toDF("id", "grp", "amt"))
    val sums = DpRelease.dpSums(withOutlier, Seq("grp"), "amt",
        lo = 0.0, hi = 500.0, epsilon = 1.0, seed = "s")
      .select("grp", "clamped_sum").as[(String, Double)].collect().toMap
    // outlier contributes at most 500, not 1e9
    assert(sums("g0") <= 20 * 500.0 + 500.0, sums("g0"))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      DpRelease.dpCounts(recs, Seq("grp"), 0.0, "s")
    }
    intercept[IllegalArgumentException] {
      DpRelease.dpSums(recs, Seq("grp"), "amt", 5.0, 5.0, 1.0, "s")
    }
  }
}
