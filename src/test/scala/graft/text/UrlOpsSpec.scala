package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalizeUrl(col("u")).as("n"))
      .as[String].collect().toSeq

  test("normalizeUrl: fragment, tracking params, case, default port, trailing slash") {
    assert(norm("https://example.com/page#section") == Seq("https://example.com/page"))
    // tracking params anywhere in the query; real params survive
    assert(norm("https://example.com/p?utm_source=a&id=7") ==
      Seq("https://example.com/p?id=7"))
    assert(norm("https://example.com/p?id=7&utm_source=a") ==
      Seq("https://example.com/p?id=7"))
    assert(norm("https://example.com/p?utm_a=1&utm_b=2&fbclid=x") ==
      Seq("https://example.com/p"))
    // scheme+authority lowercase; path/query case preserved
    assert(norm("HTTPS://WWW.Example.COM/CaseD/Path?Q=V") ==
      Seq("https://www.example.com/CaseD/Path?Q=V"))
    // default ports dropped, explicit others kept
    assert(norm("http://example.com:80/x", "https://example.com:443/x",
        "http://example.com:8080/x") ==
      Seq("http://example.com/x", "https://example.com/x",
        "http://example.com:8080/x"))
    assert(norm("https://example.com/dir/") == Seq("https://example.com/dir"))
    // a LONGER param name containing a tracking name is NOT a tracking
    // param — the separator anchor must not fire inside 'xutm_source'
    assert(norm("https://example.com/p?xutm_source=v&id=1") ==
      Seq("https://example.com/p?xutm_source=v&id=1"))
    // consecutive tracking params strip as one run, real params survive
    // on both sides
    assert(norm("https://example.com/p?a=1&utm_x=2&utm_y=3&b=4") ==
      Seq("https://example.com/p?a=1&b=4"))
    // no authority: only the generic rules apply, no mangling
    assert(norm("mailto:Bob@Example.com#x") == Seq("mailto:Bob@Example.com"))
    // idempotent on already-normal input
    assert(norm("https://example.com/p?id=7") == Seq("https://example.com/p?id=7"))
  }

  test("host + registeredDomain handle multi-part suffixes") {
    val rows = Seq(
      "https://www.bbc.co.uk/news", "https://a.b.example.com/x",
      "https://example.com.au:8443/y", "http://localhost/z",
      "https://example.org/w")
      .toDF("u")
      .select(UrlOps.host(col("u")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("d"))
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(
      ("www.bbc.co.uk", "bbc.co.uk"),
      ("a.b.example.com", "example.com"),
      ("example.com.au", "example.com.au"), // com.au suffix, 3 labels
      ("localhost", "localhost"),
      ("example.org", "example.org")))
  }

  test("dedupByUrl collapses tracking/case/port variants to the min id") {
    val df = Seq(
      (1L, "https://example.com/a?utm_source=x"),
      (2L, "HTTPS://EXAMPLE.COM:443/a"),   // same page as 1 after norm
      (3L, "https://example.com/a/"),      // same again (trailing slash)
      (4L, "https://example.com/b"))
      .toDF("doc_id", "url")
    val kept = UrlOps.dedupByUrl(df, "doc_id", "url")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("registeredDomainPsl: data-driven suffixes beat the 16-suffix fallback") {
    def dom(hosts: String*): Seq[String] =
      hosts.toDF("h").select(UrlOps.registeredDomainPsl(col("h")).as("d"))
        .as[String].collect().toSeq
    // private-section hosting platforms: each user site is its own
    // registered domain (the fallback collapses them all to github.io)
    assert(dom("someuser.github.io", "project.pages.someuser.github.io") ==
      Seq("someuser.github.io", "someuser.github.io"))
    assert(dom("myblog.blogspot.com", "shop.myshopify.com") ==
      Seq("myblog.blogspot.com", "shop.myshopify.com"))
    // com.br subtypes beyond the fallback's list
    assert(dom("www.empresa.com.br", "site.blog.br", "a.b.art.br") ==
      Seq("empresa.com.br", "site.blog.br", "b.art.br"))
    // 3- and 4-label suffixes (US locality space): longest match wins
    assert(dom("school.k12.ca.us", "district.k12.ma.us", "academy.pvt.k12.ma.us") ==
      Seq("school.k12.ca.us", "district.k12.ma.us", "academy.pvt.k12.ma.us"))
    // the parent 2-label state space still matches below k12
    assert(dom("city.ca.us") == Seq("city.ca.us"))
    // ordinary TLDs take the default last-2 rule; short hosts pass through
    assert(dom("www.example.com", "example.com", "localhost") ==
      Seq("example.com", "example.com", "localhost"))
    // parity with the fallback on its own 16 suffixes
    assert(dom("www.bbc.co.uk", "news.site.com.au") ==
      Seq("bbc.co.uk", "site.com.au"))
  }

  test("parseSuffixes skips comments and unsupported wildcard/exception rules") {
    val psl = UrlOps.parseSuffixes(Iterator(
      "// comment", "", "co.uk", "*.ck", "!www.ck", "GITHUB.IO", "k12.ca.us"))
    assert(psl.byLabels(2).toSet == Set("co.uk", "github.io"))
    assert(psl.byLabels(3) == Seq("k12.ca.us"))
    assert(psl.labelCounts == Seq(3, 2))
  }

  test("perDomainCap keeps exactly cap rows per registered domain, deterministically") {
    val df = (1L to 30L).map { i =>
      val dom = if (i <= 20) "big.com" else "small.org"
      (i, s"https://www.$dom/page/$i")
    }.toDF("doc_id", "url")
    val out = UrlOps.perDomainCap(df, "doc_id", "url", cap = 5)
    val byDom = out.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("big.com" -> 5L, "small.org" -> 5L))
    // same input → same survivors (content-keyed order, not rand())
    val again = UrlOps.perDomainCap(df, "doc_id", "url", cap = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // under-cap domains pass through whole
    assert(UrlOps.perDomainCap(df, "doc_id", "url", cap = 50).count() == 30)
  }

  test("filterBlockedDomains drops listed registered domains and their subdomains") {
    val df = Seq(
      (1L, "https://www.example.com/ok"),
      (2L, "https://spam-domain.com/x"),
      (3L, "https://deep.sub.spam-domain.com/y"),   // subdomain: blocked
      (4L, "https://SPAM-DOMAIN.com/z"),            // case-folded host
      (5L, "https://www.bad-site.co.uk/a"),         // multi-part suffix
      (6L, "https://notspam-domain.com.example.org/b")) // different eTLD+1
      .toDF("doc_id", "url")
    val kept = UrlOps.filterBlockedDomains(df, "url",
        Seq("Spam-Domain.com", "bad-site.co.uk"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
    // plan shape: a narrow filter — no join, no shuffle
    val plan = UrlOps.filterBlockedDomains(df, "url", Seq("spam-domain.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("perDomainCap plan: bounded-heap aggregate, no per-domain window") {
    // the hot-domain contract: selection must ride the mergeable
    // topk_by aggregate (cap·tasks rows per domain cross the shuffle),
    // NEVER a row_number window that funnels a whole domain into one
    // task's sort. If a Window op reappears here, the operator has
    // regressed to the scale-killer shape.
    val df = (1L to 100L).map(i => (i, s"https://www.hot.com/p/$i"))
      .toDF("doc_id", "url")
    val plan = UrlOps.perDomainCap(df, "doc_id", "url", cap = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept back into perDomainCap:\n$plan")
    assert(plan.contains("partial_topk_rows_by"),
      s"expected map-side partial topk_rows_by aggregate in plan:\n$plan")
    // single-pass: winners carry their payload, so there is no
    // join-back and no second scan of the source
    assert(!plan.contains("Join"), s"unexpected join-back in plan:\n$plan")
  }
}
