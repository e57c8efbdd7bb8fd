package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Double =
    Seq(s).toDF("t").select(DeflateRatio.deflateRatio(col("t")).as("r"))
      .as[Double].head()

  test("matches a direct Deflater reference on known streams") {
    def ref(s: String): Double = {
      val bytes = s.getBytes("UTF-8")
      if (bytes.isEmpty) return 1.0
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      total.toDouble / bytes.length
    }
    val cases = Seq("hello world", "a" * 1000,
      (1 to 200).map(i => s"tok${i % 7}").mkString(" "),
      "The quick brown fox jumps over the lazy dog. " * 3)
    cases.foreach(s => assert(ratio(s) == ref(s), s"ratio mismatch for: ${s.take(30)}"))
  }

  test("repetitive text compresses far below varied prose; empty is 1.0") {
    val boiler = ratio("click here to accept cookies " * 100)
    val prose = ratio("wizards quietly brew strong coffee under bright autumn " +
      "skies while children watch distant ships sail past rocky cliffs " +
      "and merchants argue about grain prices near the old harbor wall")
    assert(boiler < 0.1, s"boilerplate ratio $boiler")
    assert(prose > 0.5, s"prose ratio $prose")
    assert(ratio("") == 1.0)
  }

  test("stable across repeated evaluation (thread-local deflater reset)") {
    val df = (1 to 500).map(i => (i.toLong, s"doc $i " + ("word " * (i % 50))))
      .toDF("id", "t")
    val a = df.select(col("id"), DeflateRatio.deflateRatio(col("t")).as("r"))
      .as[(Long, Double)].collect().toMap
    val b = df.repartition(7)
      .select(col("id"), DeflateRatio.deflateRatio(col("t")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("registered for SQL; null-safe; type-checked") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql("SELECT deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaa') AS r")
      .as[Double].head()
    assert(r > 0 && r < 1)
    val g = spark.sql("SELECT char_grams('abcab', 2, false) AS g")
      .as[Seq[String]].head()
    assert(g == Seq("ab", "bc", "ca", "ab"))
    assert(spark.sql("SELECT char_grams('abcab', 2) AS g")
      .as[Seq[String]].head() == Seq("ab", "bc", "ca"))
    val n = Seq[Option[String]](None).toDF("t")
      .select(DeflateRatio.deflateRatio(col("t"))).collect().head
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(DeflateRatio.deflateRatio(col("i"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("stays in whole-stage codegen (no CodegenFallback)") {
    val plan = spark.range(10)
      .select(DeflateRatio.deflateRatio(
        concat(lit("doc "), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix is the WholeStageCodegen marker in the
    // compact plan string — its absence would mean CodegenFallback
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
  }
}
