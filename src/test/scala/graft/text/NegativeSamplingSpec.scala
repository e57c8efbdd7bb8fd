package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def wf = Seq(("common", 810000L), ("mid", 10000L), ("rare", 16L))
    .toDF("word", "freq")

  test("table has exactly tableSize buckets, proportional to freq^0.75") {
    val t = NegativeSampling.sampleTable(wf, tableSize = 1000)
    val counts = t.groupBy("neg_word").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000)
    // weights: 810000^.75 = 27000^... ratios — common dominates but
    // sub-linearly: freq ratio common/mid = 81, weight ratio = 81^.75 ≈ 27
    val ratio = counts("common").toDouble / counts("mid")
    assert(ratio > 20 && ratio < 35, s"ratio=$ratio counts=$counts")
    // sub-bucket-share words can quantize to zero buckets — word2vec's
    // own table has the same property
    assert(counts.getOrElse("rare", 0L) <= 1, counts)
  }

  test("every bucket 0..M-1 appears exactly once") {
    val t = NegativeSampling.sampleTable(wf, tableSize = 64)
    val buckets = t.select("bucket").as[Long].collect().sorted
    assert(buckets.toSeq == (0L until 64L), buckets.toSeq)
  }

  test("topV cap excludes tail words from the table") {
    val t = NegativeSampling.sampleTable(wf, tableSize = 100, topV = 2)
    val words = t.select("neg_word").distinct().as[String].collect().toSet
    assert(words == Set("common", "mid"), words)
  }

  test("draws are deterministic, seeded, and k per item") {
    val t = NegativeSampling.sampleTable(wf, tableSize = 128)
    val items = Seq("a", "b").toDF("center")
    def draw(seed: String) =
      NegativeSampling.drawNegatives(items.repartition(3), Seq("center"),
          k = 4, t, seed)
        .as[(String, Int, String)].collect().toSet
    assert(draw("s1") == draw("s1"))
    assert(draw("s1") != draw("s2"))
    assert(draw("s1").size == 8)
    assert(draw("s1").groupBy(_._1).forall(_._2.size == 4))
  }
}
