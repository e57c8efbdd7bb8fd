package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("topPairs counts adjacent pairs weighted by word frequency") {
    // "aab" x3 and "ab" x2: pair "aa" ← 3 (once per aab),
    // "ab" ← 3 + 2 = 5
    val df = Seq((1L, "aab ab aab"), (2L, "aab AB")).toDF("id", "text")
    val out = Bpe.topPairs(df, "text", topK = 10)
      .as[(String, Long)].collect().toMap
    assert(out("ab") === 5L)
    assert(out("aa") === 3L)
    assert(out.size === 2)
  }

  test("a pair occurring twice in one word contributes twice its freq") {
    val df = Seq((1L, "aaa aaa")).toDF("id", "text")
    val out = Bpe.topPairs(df, "text", topK = 5)
      .as[(String, Long)].collect().toMap
    // "aaa" freq 2, contains "aa" at positions 1 and 2 → 4
    assert(out === Map("aa" -> 4L))
  }

  test("single-char words contribute nothing; order is count desc then pair") {
    val df = Seq((1L, "a b c zz zz yy")).toDF("id", "text")
    val rows = Bpe.topPairs(df, "text", topK = 5)
      .as[(String, Long)].collect()
    assert(rows.toSeq === Seq(("zz", 2L), ("yy", 1L)))
  }

  test("wordFreq collapses the corpus to its vocabulary before exploding") {
    // the pair explosion must read the DISTINCT-word table, not the
    // corpus: vocabulary rows == distinct case-folded words
    val df = Seq((1L, "spark spark SPARK flame")).toDF("id", "text")
    assert(Bpe.wordFreq(df, "text").count() === 2)
    val plan = Bpe.topPairs(df, "text", topK = 3)
      .queryExecution.executedPlan.toString
    // top-k must be TakeOrdered (map-side partial top-k), not a sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
