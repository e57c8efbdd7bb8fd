package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "ACCEPT COOKIES\nunique thought one\nfooter text"),
    (2L, "ACCEPT COOKIES\nunique thought two\nfooter text"),
    (3L, "ACCEPT COOKIES\nunique thought three\nfooter text"),
    (4L, "all original content\nnothing shared here"))
    .toDF("doc_id", "text")

  test("dedupLines drops corpus-repeated lines, keeps unique content in order") {
    val out = LineDedup.dedupLines(docs, "doc_id", "text", minDf = 2)
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "unique thought one")
    assert(out(2L)._2 == "unique thought two")
    assert(out(1L)._3 == 1 && out(1L)._4 == 2)
    // untouched doc passes through whole, order preserved
    assert(out(4L)._2 == "all original content\nnothing shared here")
    assert(out(4L)._3 == 2 && out(4L)._4 == 0)
  }

  test("keepFirst retains exactly one occurrence at the smallest (id, pos)") {
    val out = LineDedup.dedupLines(docs, "doc_id", "text", minDf = 2,
        keepFirst = true)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // doc 1 is the first bearer of both boilerplate lines
    assert(out(1L) == "ACCEPT COOKIES\nunique thought one\nfooter text")
    assert(out(2L) == "unique thought two")
    assert(out(3L) == "unique thought three")
  }

  test("a doc that is pure boilerplate dedups to the empty string, not null") {
    val d = Seq((1L, "same line"), (2L, "same line")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text", minDf = 2)
      .select("doc_id", "text", "n_lines_kept")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "" && out(1L)._3 == 0)
  }

  test("whitespace-jittered duplicates collapse (trimmed key), original text kept verbatim") {
    val d = Seq(
      (1L, "  padded banner  \nkeep me"),
      (2L, "padded banner\nkeep me too")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(d, "doc_id", "text", minDf = 2)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) == "keep me")
    assert(out(2L) == "keep me too")
  }

  test("minDf above the max df keeps everything") {
    val out = LineDedup.dedupLines(docs, "doc_id", "text", minDf = 10)
    assert(out.where(col("n_lines_dropped") > 0).isEmpty)
  }
}
