package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  private def half(mod: Int) =
    spark.range(2000).select(
      (col("id") % 100).cast("double").as("x"),
      when(col("id") % 4 === mod, "a").otherwise("b").as("cat"))

  test("identical distributions show no drift") {
    val base = half(0)
    val psi = Drift.psiNumeric(base, base, Seq("x")).head()
    assert(psi.getDouble(1) < 0.01 && !psi.getBoolean(2))
    val tvd = Drift.categoricalDrift(base, base, Seq("cat")).head()
    assert(tvd.getDouble(1) === 0.0 && !tvd.getBoolean(2))
  }

  test("location shift is flagged by PSI") {
    val base = spark.range(2000).select((col("id") % 100).cast("double").as("x"))
    val cand = spark.range(2000).select((col("id") % 100 + 60).cast("double").as("x"))
    val r = Drift.psiNumeric(base, cand, Seq("x")).head()
    assert(r.getDouble(1) > 0.2 && r.getBoolean(2))
  }

  test("category mix change is flagged by TVD") {
    val base = half(0)  // 25% a / 75% b
    val cand = spark.range(2000).select(
      (col("id") % 100).cast("double").as("x"),
      when(col("id") % 4 < 3, "a").otherwise("b").as("cat")) // 75% a
    val r = Drift.categoricalDrift(base, cand, Seq("cat")).head()
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-9 && r.getBoolean(2))
  }

  test("multi-column single-scan report covers every requested column") {
    val base = half(0)
    val out = Drift.psiNumeric(base, half(1), Seq("x"))
      .union(Drift.categoricalDrift(base, half(1), Seq("cat"))
        .withColumnRenamed("tvd", "psi"))
    assert(out.select("col_name").collect().map(_.getString(0)).sorted
      === Array("cat", "x"))
  }
}
