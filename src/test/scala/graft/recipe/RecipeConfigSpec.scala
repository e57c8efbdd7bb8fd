package graft.recipe

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class RecipeConfigSpec extends SparkSpec {
  import spark.implicits._

  // varied words (the Gopher gate rejects repetitive text) with an
  // every-third English stopword to satisfy the stopword-ratio rule
  private def passText(tag: String): String =
    (1 to 40).map(i => if (i % 3 == 0) "the" else s"${tag}word$i")
      .mkString(" ")

  private val docs = Seq(
    (1L, "en", passText("a")), (2L, "en", passText("a")),
    (3L, "de", passText("b")), (4L, "en", "short"),
    (5L, "fr", passText("c"))
  ).toDF("doc_id", "lang", "text")

  test("every stage kind round-trips through JSON losslessly") {
    val rc = RecipeConfig("doc_id", "text", "lang", Seq(
      RecipeStage.GopherGate(30, 100000), RecipeStage.C4Clean(),
      RecipeStage.QualityMin(0.4), RecipeStage.LangAllow(Seq("en", "de")),
      RecipeStage.MinChars(10), RecipeStage.ScrubPii(),
      RecipeStage.ExactDedup(), RecipeStage.HashSample(0.5, "s1"),
      RecipeStage.Mix(Map("en" -> 0.5, "de" -> 0.5), replayable = true),
      RecipeStage.TokenBudget(1000L)))
    assert(RecipeConfig.fromJson(rc.toJson) == rc)
  }

  test("loaded recipe matches the hand-compiled chain row for row") {
    val json = """{"stages": [
      {"kind": "gopherGate"},
      {"kind": "langAllow", "langs": ["en", "de"]},
      {"kind": "exactDedup"},
      {"kind": "tokenBudget", "budget": 100}
    ]}"""
    val got = RecipeConfig.fromJson(json).run(docs)
      .select("doc_id").as[Long].collect().toSet
    val kept = docs.where(TextAnalysis.gopherKeep(col("text")))
      .where(col("lang").isInCollection(Seq("en", "de")))
    val fp = kept.withColumn("_fp",
      TextAnalysis.canonicalFingerprint(col("text")))
    val reps = fp.groupBy("_fp").agg(min("doc_id").as("doc_id"))
    val deduped = fp.join(reps, Seq("_fp", "doc_id")).drop("_fp")
    val want = graft.ops.Sampling.tokenBudget(
      deduped.withColumn("n_tokens", TextAnalysis.wsTokenCount(col("text"))),
      "lang", "doc_id", "n_tokens", 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
    assert(!got.contains(2L), "dup of doc 1 must dedupe away")
    assert(!got.contains(4L), "short doc fails the gopher gate")
  }

  test("stage semantics: sample rate, minChars, quality gate") {
    val many = (1L to 400L).map(i => (i, "en", s"document number $i with some words"))
      .toDF("doc_id", "lang", "text")
    val n = RecipeConfig.fromJson(
      """{"stages": [{"kind": "hashSample", "rate": 0.25, "seed": "x"}]}""")
      .run(many).count()
    assert(n > 60 && n < 140, s"sample kept $n of 400")
    val m = RecipeConfig.fromJson(
      """{"stages": [{"kind": "minChars", "n": 6}]}""")
      .run(docs).select("doc_id").as[Long].collect().toSet
    assert(!m.contains(4L) && m.contains(1L))
  }

  test("unknown stage kinds and malformed params fail at parse time") {
    intercept[IllegalArgumentException] {
      RecipeConfig.fromJson("""{"stages": [{"kind": "launchMissiles"}]}""")
    }
    intercept[IllegalArgumentException] {
      RecipeConfig.fromJson("""{"stages": [{"kind": "qualityMin"}]}""")
    }
    intercept[IllegalArgumentException] {
      RecipeConfig.fromJson("""{"stages": {"kind": "c4Clean"}}""")
    }
  }

  test("file load round trip") {
    val rc = RecipeConfig("doc_id", "text", "lang",
      Seq(RecipeStage.MinChars(5)))
    val f = java.nio.file.Files.createTempFile("recipe", ".json")
    java.nio.file.Files.writeString(f, rc.toJson)
    assert(RecipeConfig.load(spark, f.toString) == rc)
  }
}
