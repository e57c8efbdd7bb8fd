package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // 3-word spans keep the fixtures readable
  private val boiler = "all rights reserved"

  test("spans: non-overlapping w-word windows with a short tail") {
    val df = Seq((1L, "a b c d e f g h"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val sp = SpanDedup.spans(df, "id", "text", w = 3)
      .orderBy("doc_id", "span_idx")
      .as[(Long, Int, String)].collect()
    // 8 tokens → ceil(8/3) = 3 spans, last is the 2-word tail;
    // blank docs produce nothing
    assert(sp.toSeq === Seq((1L, 0, "a b c"), (1L, 1, "d e f"), (1L, 2, "g h")))
  }

  test("removeRepeatedSpans drops corpus-repeated spans, keeps unique text") {
    val df = Seq(
      (1L, s"$boiler unique one text here goes"),
      (2L, s"$boiler other words entirely fresh stuff"),
      (3L, s"$boiler third doc content again varies"),
      (4L, boiler) // nothing but boilerplate
    ).toDF("id", "text")
    val out = SpanDedup.removeRepeatedSpans(df, "id", "text", w = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, String)].collect()
    // the shared leading span vanishes everywhere; doc 4 disappears
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall(r => !r._3.contains("rights")))
    assert(out.head._3 === "unique one text here goes")
    // minDocs above the repeat count removes nothing
    val loose = SpanDedup.removeRepeatedSpans(df, "id", "text", w = 3, minDocs = 5)
    assert(loose.count() === 4)
  }

  test("keepOne spares exactly the (min doc, min idx) occurrence") {
    val df = Seq(
      (5L, s"$boiler alpha beta gamma"),
      (2L, s"prefix words here $boiler"),
      (9L, s"$boiler delta epsilon zeta")
    ).toDF("id", "text")
    val out = SpanDedup.removeRepeatedSpans(df, "id", "text", w = 3,
        minDocs = 2, keepOne = true)
      .orderBy("doc_id").as[(Long, Long, String)].collect()
    // doc 2 has the smallest doc_id → its occurrence survives
    assert(out.find(_._1 == 2L).get._3 === s"prefix words here $boiler")
    assert(out.filter(_._1 != 2L).forall(!_._3.contains("rights")))
  }

  test("property: output always equals the in-Scala reference") {
    // randomized corpora with engineered sharing: compare the Spark
    // operator against a direct Scala implementation of the same
    // semantics (w-word windows, distinct-doc >= minDocs, remove-all)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl")
    for (trial <- 1 to 5) {
      val shared = Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val corpus = (1L to 12L).map { id =>
        val own = Seq.fill(2 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        val words =
          if (id % 3 == 0) shared.split(" ").toSeq ++ own else own
        id -> words.mkString(" ")
      }
      val expect = {
        val spans = corpus.map { case (id, text) =>
          id -> text.split("\\s+").filter(_.nonEmpty).grouped(3)
            .map(_.mkString(" ")).toVector }
        val hot = spans.flatMap { case (id, sp) => sp.distinct.map(_ -> id) }
          .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
        spans.map { case (id, sp) =>
          id -> sp.zipWithIndex.filterNot(s => hot(s._1)) }
          .filter(_._2.nonEmpty)
          .map { case (id, sp) => (id, sp.size.toLong, sp.map(_._1).mkString(" ")) }
          .sortBy(_._1)
      }
      val got = SpanDedup.removeRepeatedSpans(
          corpus.toDF("id", "text"), "id", "text", w = 3, minDocs = 2)
        .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
      assert(got === expect, s"trial $trial corpus $corpus")
    }
  }

  test("repeats WITHIN one document do not count as corpus repeats") {
    val df = Seq(
      (1L, s"$boiler $boiler $boiler"), // 3 occurrences, 1 document
      (2L, "totally unrelated content here")
    ).toDF("id", "text")
    val out = SpanDedup.removeRepeatedSpans(df, "id", "text", w = 3, minDocs = 2)
    assert(out.count() === 2) // distinct-doc count is 1 → span kept
  }
}
