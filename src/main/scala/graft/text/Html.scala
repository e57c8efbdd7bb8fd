package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML processing for web-crawl corpora — the step between the raw
  * crawl and every text operator in this package: strip markup to
  * text (so quality/dedup/LM filters see prose, not tags) and extract
  * the outbound links that feed the URL/link-graph operators
  * ([[UrlOps]], [[graft.ops.PageRank]]).
  *
  * Everything is a codegen'd `regexp_replace`/`regexp_extract_all`
  * chain — scan-speed, no UDFs — with patterns restricted to
  * RE2-compatible syntax (inline `(?is)` flags, lazy `.*?`, no
  * lookaround) so the DuckDB oracle replays them verbatim. This is
  * deliberately NOT a spec-complete HTML5 parser: a tree parser per
  * document is a per-row interpreter the scan can't afford at 100 TB,
  * and boilerplate-level extraction (the trafilatura/jusText family's
  * first stage) is regex-shaped. Malformed nesting degrades to extra
  * whitespace, never to an exception.
  */
object Html {

  /** Markup → text:
    *  1. drop `<script>`/`<style>` ELEMENTS (content included — code
    *     and CSS are not prose), lazily up to the first close tag;
    *  2. drop comments `<!-- … -->`;
    *  3. every remaining tag → one space (block boundaries become
    *     token boundaries; never concatenates adjacent words);
    *  4. decode the fixed entity set `&nbsp; &lt; &gt; &quot; &#39;`
    *     then `&amp;` LAST — so double-escaped text (`&amp;lt;`)
    *     decodes one level (`&lt;`), not two (`<`);
    *  5. collapse whitespace runs, trim. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    trim(regexp_replace(e6, "\\s+", " "))
  }

  /** All `href` attribute values (single- or double-quoted), in
    * document order, as `array<string>` — raw targets, relative links
    * and non-http schemes included (filter at the caller). */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1))

  /** (href, anchor text) pairs in document order — the link-text
    * signal retrieval training mines (anchor text is a human-written
    * description of the TARGET page: query-document pair mining, link-
    * based titles). Two `regexp_extract_all` passes with the same
    * pattern (group 1 = href, group 2 = inner markup) zip positionally
    * — same regex on the same subject yields the same match list, so
    * alignment is structural; the inner markup then runs the
    * [[stripHtml]] chain per element (nested tags/entities inside the
    * anchor decode like any other fragment). Narrow, no shuffle. */
  def anchorPairs(html: Column): Column = {
    val pat = "(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>"
    zip_with(
      regexp_extract_all(html, lit(pat), lit(1)),
      regexp_extract_all(html, lit(pat), lit(2)),
      (h, t) => struct(h.as("href"), t.as("anchor_markup")))
  }

  /** One row per anchor with non-empty stripped text:
    * `(doc_id, href, anchor)`. Narrow explode — no shuffle. */
  def anchorTexts(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(anchorPairs(col(htmlCol))).as(Seq("pos", "a")))
      .select(col("doc_id"), col("pos"), col("a.href").as("href"),
        stripHtml(col("a.anchor_markup")).as("anchor"))
      .where(col("anchor") =!= "")

  /** One row per ABSOLUTE http(s) outbound link: `(doc_id, link,
    * dst_domain)` with the destination's registered domain (eTLD+1
    * via the PSL). Narrow explode — no shuffle. */
  def linkDomains(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(extractLinks(col(htmlCol))).as("link"))
      .where(col("link").rlike("(?i)^https?://"))
      .withColumn("dst_domain",
        UrlOps.registeredDomainPsl(UrlOps.host(col("link"))))

  /** Domain-level link graph: `(src_domain, dst_domain, n)` edge
    * weights from each doc's URL to every absolute link target — the
    * input shape for [[graft.ops.PageRank]] over a crawl. One
    * aggregation shuffle on the (src, dst) pair; map-side partials
    * collapse the within-task repeats of hot edges first. */
  def domainLinkGraph(docs: DataFrame, idCol: String, htmlCol: String,
                      srcUrlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        UrlOps.registeredDomainPsl(UrlOps.host(col(srcUrlCol))).as("src_domain"),
        explode(extractLinks(col(htmlCol))).as("link"))
      .where(col("link").rlike("(?i)^https?://"))
      .select(col("src_domain"),
        UrlOps.registeredDomainPsl(UrlOps.host(col("link"))).as("dst_domain"))
      .groupBy("src_domain", "dst_domain").agg(count(lit(1)).as("n"))
}
