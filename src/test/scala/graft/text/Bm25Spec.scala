package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark join"),              // heavy on 'spark'
    (2L, "spark stream"),                        // short, two terms
    (3L, "join filter scan sort merge window"),  // no query terms
    (4L, "stream stream stream stream stream stream stream stream"),
    (5L, "")                                     // blank doc
  ).toDF("doc_id", "text")

  test("rank matches a driver-side textbook BM25 reference") {
    val terms = Seq("spark", "stream")
    val (k1, b) = (1.2, 0.75)
    // reference computation, straight from the formula
    val toks = Map(
      1L -> Seq("spark", "spark", "spark", "join"),
      2L -> Seq("spark", "stream"),
      3L -> Seq("join", "filter", "scan", "sort", "merge", "window"),
      4L -> Seq.fill(8)("stream"),
      5L -> Seq.empty[String])
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def df(t: String) = toks.values.count(_.contains(t))
    def score(id: Long): Double = terms.sorted.map { t =>
      val tf = toks(id).count(_ == t)
      if (tf == 0) 0.0
      else {
        val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val s = idf * tf * (k1 + 1) /
          (tf + k1 * (1 - b + b * toks(id).size / avgdl))
        math.floor(s * 10000) / 10000
      }
    }.sum
    val got = Bm25.rank(docs, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 4L)) // only docs matching a term
    got.foreach { case (id, s) =>
      assert(math.abs(s - score(id)) < 1e-9, s"doc $id: $s vs ${score(id)}")
    }
  }

  test("query terms are case-folded like the tokenization") {
    val viaUpper = Bm25.scoreTerms(docs, "doc_id", "text", Seq(" Spark ", "STREAM"))
      .select("doc_id", "token", "tf").as[(Long, String, Long)].collect().toSet
    val viaLower = Bm25.scoreTerms(docs, "doc_id", "text", Seq("spark", "stream"))
      .select("doc_id", "token", "tf").as[(Long, String, Long)].collect().toSet
    assert(viaUpper === viaLower && viaLower.nonEmpty)
  }

  test("scoreTerms df counts documents, tf counts occurrences") {
    val rows = Bm25.scoreTerms(docs, "doc_id", "text", Seq("spark", "stream"))
      .select("doc_id", "token", "tf", "df")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows === Set(
      (1L, "spark", 3L, 2L), (2L, "spark", 1L, 2L),
      (2L, "stream", 1L, 2L), (4L, "stream", 8L, 2L)))
  }

  test("rankTopK returns rank's head and plans as TakeOrdered, not a global sort") {
    val full = Bm25.rank(docs, "doc_id", "text", Seq("spark", "stream"))
      .as[(Long, Double)].collect().toSeq
    val top = Bm25.rankTopK(docs, "doc_id", "text", Seq("spark", "stream"), n = 2)
    assert(top.as[(Long, Double)].collect().toSeq === full.take(2))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected map-side top-n in:\n$plan")
  }

  test("postings are term-filtered between the explode and the tf aggregate") {
    val plan = Bm25.scoreTerms(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.optimizedPlan.toString
    // optimized-plan text prints top-down: the tf Aggregate must sit
    // ABOVE a Filter carrying the term set, which sits ABOVE the
    // Generate (explode) — i.e. only query-term postings reach the
    // shuffle, the corpus-wide token stream never does
    val agg = plan.indexOf("Aggregate")
    val filt = plan.indexOf("spark")
    val gen = plan.indexOf("Generate")
    assert(agg >= 0 && filt > agg && gen > filt,
      s"expected Aggregate < term Filter < Generate ordering in:\n$plan")
  }
}
