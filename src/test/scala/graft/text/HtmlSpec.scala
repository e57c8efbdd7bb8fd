package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Html.stripHtml(col("h")).as("t"))
      .as[String].head()

  test("stripHtml removes script/style content, comments and tags") {
    val html = """<html><head><title>T</title>
      |<style type="text/css">body { color: red; }</style>
      |<script>var x = 1 < 2; // </script></head>
      |<body><!-- secret --><h1>Hello</h1><p>world</p></body></html>""".stripMargin
    assert(strip(html) == "T Hello world")
  }

  test("stripHtml decodes the entity set, &amp; last (no double decode)") {
    assert(strip("<p>A &amp; B</p>") == "A & B")
    assert(strip("<p>&lt;b&gt;not a tag&lt;/b&gt;</p>") == "<b>not a tag</b>")
    assert(strip("<p>&quot;q&quot; &#39;s&#39;&nbsp;end</p>") == "\"q\" 's' end")
    // double-escaped: one decode level only
    assert(strip("<p>&amp;lt;</p>") == "&lt;")
  }

  test("stripHtml turns tags into token boundaries and collapses whitespace") {
    assert(strip("<p>one</p><p>two</p>") == "one two")
    assert(strip("  <div>\n a \t b \n</div> ") == "a b")
    assert(strip("") == "")
  }

  test("malformed markup degrades to whitespace, never throws") {
    assert(strip("<p unclosed attr <b>text") == "text")
    assert(strip("<script>never closed") == "<script>never closed".replaceAll("<[^>]*>", " ").trim)
  }

  test("extractLinks pulls single- and double-quoted hrefs in order") {
    val html = """<a href="https://a.com/1">x</a><A HREF='http://b.org/2'>y</A>
      |<a href = "/rel">z</a><link href="style.css">""".stripMargin
    val links = Seq(html).toDF("h")
      .select(Html.extractLinks(col("h")).as("l")).as[Seq[String]].head()
    assert(links == Seq("https://a.com/1", "http://b.org/2", "/rel", "style.css"))
  }

  test("linkDomains keeps absolute http(s) links only and resolves eTLD+1") {
    val docs = Seq(
      (1L, """<a href="https://news.example.co.uk/a">n</a>
        |<a href="/relative">r</a><a href="mailto:x@y.z">m</a>
        |<a href="HTTP://www.other.com/b">o</a>""".stripMargin)
    ).toDF("doc_id", "html")
    val got = Html.linkDomains(docs, "doc_id", "html")
      .select("link", "dst_domain").as[(String, String)].collect().toSet
    assert(got == Set(
      "https://news.example.co.uk/a" -> "example.co.uk",
      "HTTP://www.other.com/b" -> "other.com"))
  }

  test("domainLinkGraph aggregates edge weights per (src, dst) domain pair") {
    val docs = Seq(
      (1L, "https://www.s1.com/p",
        """<a href="https://a.com/1">x</a><a href="https://a.com/2">y</a>
          |<a href="https://b.com/1">z</a>""".stripMargin),
      (2L, "https://sub.s1.com/q", """<a href="https://a.com/3">w</a>"""))
      .toDF("doc_id", "url", "html")
    val got = Html.domainLinkGraph(docs, "doc_id", "html", "url")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("s1.com", "a.com", 3L), ("s1.com", "b.com", 1L)))
  }

  test("the strip and graph plans are narrow apart from the edge aggregation") {
    val docs = Seq((1L, "u", "<p>h</p>")).toDF("doc_id", "url", "html")
    val stripPlan = docs.select(Html.stripHtml(col("html")))
      .queryExecution.executedPlan.toString
    assert(!stripPlan.contains("Exchange"), s"strip must not shuffle:\n$stripPlan")
    val graphPlan = Html.domainLinkGraph(docs, "doc_id", "html", "url")
      .queryExecution.executedPlan.toString
    assert(graphPlan.contains("HashAggregate"), s"expected agg in:\n$graphPlan")
    assert(!graphPlan.contains("Window"), s"no window in:\n$graphPlan")
  }

  test("anchorTexts pairs hrefs with stripped inner text, dropping empty anchors") {
    import spark.implicits._
    val html =
      "<a href=\"https://a.com/1\"><b>Bold</b> &amp; <i>nested</i></a>" +
      "<a href='/rel' class=\"x\">   </a>" +
      "<a name=noHref>not a link</a>" +
      "<a href=\"https://b.org\">plain  text</a>"
    val rows = Html.anchorTexts(Seq((1L, html)).toDF("id", "h"), "id", "h")
      .orderBy("pos")
      .select("pos", "href", "anchor").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // pos counts ALL anchors (the whitespace-only one is filtered
    // after numbering); the href-less <a> never matches
    assert(rows.toSeq == Seq(
      (0, "https://a.com/1", "Bold & nested"),
      (2, "https://b.org", "plain text")))
  }
}
