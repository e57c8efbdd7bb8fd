package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"), // contains probe 1's 4-gram
    (101L, "quick brown fox sleeps all day long"),         // only a 3-gram overlap
    (102L, "entirely different text with no shared phrases"),
    (103L, "THE Quick BROWN fox jumps again")              // case-folded hit
  ).toDF("doc_id", "text")

  private def probes = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "lorem ipsum dolor sit amet")
  ).toDF("doc_id", "text")

  test("flags exactly the docs sharing a full word n-gram, case-insensitively") {
    val out = Decontaminate.overlaps(corpus, probes, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    // 100: "the quick brown fox" + "quick brown fox jumps" → 2 hits;
    // 103: both grams too (case-folded); 101 has only 3 shared words;
    // 102 shares nothing; probe 2 hits nothing
    assert(out.keySet === Set(100L, 103L))
    assert(out(100L) === ((2L, 1L)) && out(103L) === ((2L, 1L)))
  }

  test("minHits raises the evidence bar") {
    val strict = Decontaminate.overlaps(corpus, probes, "doc_id", "text",
      n = 4, minHits = 3L)
    assert(strict.count() == 0)
  }

  test("bloom path reproduces the exact path bit-identically") {
    val exact = Decontaminate.overlaps(corpus, probes, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontaminate.overlapsBloom(corpus, probes, "doc_id", "text",
        n = 4, expectedItems = 1000L, fpp = 0.01)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom === exact)
  }

  test("undersized bloom (high fp rate) still yields the exact answer via the verify join") {
    // expectedItems = 1 forces a tiny, saturated filter — nearly every
    // gram survives the prefilter; the verify join must still kill all
    // false positives
    val exact = Decontaminate.overlaps(corpus, probes, "doc_id", "text", n = 4)
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Decontaminate.overlapsBloom(corpus, probes, "doc_id", "text",
        n = 4, expectedItems = 1L, fpp = 0.5)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom === exact)
  }

  test("probe grams broadcast — the corpus stream is never shuffled before the join") {
    val plan = Decontaminate.overlaps(corpus, probes, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
