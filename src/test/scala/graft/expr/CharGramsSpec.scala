package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharGramsSpec extends SparkSpec {
  import spark.implicits._

  private def viaKernel(s: String, k: Int, distinct: Boolean): Seq[String] =
    Seq(s).toDF("s")
      .select(CharGrams.charGrams(col("s"), k, distinct).as("g"))
      .as[Seq[String]].head()

  private def viaSubstring(s: String, k: Int): Seq[String] =
    Seq(s).toDF("s")
      .select(expr(s"array_distinct(transform(sequence(1, length(s) - ${k - 1}), i -> substring(s, i, $k)))").as("g"))
      .as[Seq[String]].head()

  test("matches the substring-transform formulation exactly (order included)") {
    val cases = Seq("abcdefg", "aaaaaa", "abcabcabc", "ab",
      "héllo wörld héllo", "日本語テキスト日本語", "mixed 日本 ascii")
    for (s <- cases; k <- Seq(2, 3, 5) if s.length >= k) {
      assert(viaKernel(s, k, distinct = true) == viaSubstring(s, k),
        s"distinct grams diverge for '$s' k=$k")
    }
  }

  test("non-distinct emits every window; short/empty strings yield empty") {
    assert(viaKernel("abcab", 2, distinct = false) ==
      Seq("ab", "bc", "ca", "ab"))
    assert(viaKernel("ab", 5, distinct = true) == Seq.empty)
    assert(viaKernel("", 3, distinct = true) == Seq.empty)
  }

  test("null-safe, type-checked, codegen") {
    val n = Seq[Option[String]](None).toDF("s")
      .select(CharGrams.charGrams(col("s"), 3)).collect().head
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(CharGrams.charGrams(col("i"), 3)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
    val plan = spark.range(5)
      .select(CharGrams.charGrams(concat(lit("xy"), col("id").cast("string")), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen:\n$plan")
  }

  test("linear, not quadratic: 4x the doc length costs well under 16x") {
    def time(len: Int): Double = {
      // driver-built strings: a 4000-arg concat would blow the 64KB
      // generated-method limit and pollute the timing with fallback
      val docs = (0 until 64).map { i =>
        val rnd = new scala.util.Random(i)
        (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }.toDF("s").repartition(8).cache()
      docs.count()
      val t0 = System.nanoTime()
      docs.select(explode(CharGrams.charGrams(col("s"), 5)).as("g")).count()
      val t = (System.nanoTime() - t0) / 1e9
      docs.unpersist(); t
    }
    time(4000) // warm-up
    val t1 = (1 to 3).map(_ => time(8000)).min
    val t4 = (1 to 3).map(_ => time(32000)).min
    // the substring form measured ~14x here; linear is ~4x (+noise)
    assert(t4 / t1 < 9.0, s"8k: $t1 s, 32k: $t4 s — ratio ${t4 / t1}")
  }
}
