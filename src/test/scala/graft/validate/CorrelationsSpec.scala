package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.Row

class CorrelationsSpec extends SparkSpec {
  import spark.implicits._

  private def corrMap(rows: Array[Row]): Map[(String, String), Option[Double]] =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("perfect linear pairs hit +-1 within the 1e-6 floor") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, 100.0 - i))
      .toDF("a", "b", "c")
    val m = corrMap(Profiler.correlations(df, Seq("a", "b", "c")).collect())
    assert(m(("a", "b")).get >= 0.999999)
    assert(m(("a", "c")).get <= -0.999999 && m(("a", "c")).get >= -1.000001)
    assert(m(("b", "c")).get <= -0.999999)
  }

  test("constant column yields NULL, not NaN or crash") {
    val df = (1 to 20).map(i => (i.toDouble, 7.5)).toDF("a", "k")
    val m = corrMap(Profiler.correlations(df, Seq("a", "k")).collect())
    assert(m(("a", "k")).isEmpty)
  }

  test("pairwise deletion: each pair counts its own non-null rows") {
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 2.0, null), (2.0, 4.0, 1.0), (3.0, null, 2.0), (4.0, 8.0, 3.0))
      .toDF("a", "b", "c")
    val rows = Profiler.correlations(df, Seq("a", "b", "c")).collect()
    val ns = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ns(("a", "b")) == 3L && ns(("a", "c")) == 3L && ns(("b", "c")) == 2L)
  }

  test("quantization floor is applied before the sums") {
    // values differing only below 1/quant collapse: corr with the
    // rounded copy is exactly 1 (identical quantized vectors)
    val df = (1 to 30).map(i => (i + 0.001, i + 0.004)).toDF("a", "b")
    val m = corrMap(Profiler.correlations(df, Seq("a", "b"), quant = 10L)
      .collect())
    assert(m(("a", "b")).get >= 0.999999)
  }

  test("deterministic across partitionings") {
    val df = (1 to 500).map(i =>
      ((i % 37).toDouble, (i % 11).toDouble, math.sin(i).abs))
      .toDF("a", "b", "c")
    val r1 = Profiler.correlations(df.repartition(1), Seq("a", "b", "c"))
      .orderBy("col_x", "col_y").collect().toSeq
    val r2 = Profiler.correlations(df.repartition(13), Seq("a", "b", "c"))
      .orderBy("col_x", "col_y").collect().toSeq
    assert(r1 == r2)
  }
}
