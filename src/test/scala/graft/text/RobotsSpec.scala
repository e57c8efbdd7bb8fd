package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(txt: String, agent: String = "*") =
    Robots.parseRules(Seq(("example.com", txt)).toDF("domain", "txt"),
      "domain", "txt", agent)
      .select("allow", "prefix").collect()
      .map(r => (r.getBoolean(0), r.getString(1))).toSet

  private def allowed(txt: String, url: String, agent: String = "*"): Boolean = {
    val r = Robots.parseRules(Seq(("example.com", txt)).toDF("domain", "txt"),
      "domain", "txt", agent)
    Robots.annotateAllowed(Seq((1L, url)).toDF("id", "url"), "url", r)
      .collect()(0).getAs[Boolean]("allowed")
  }

  test("comments, blank lines, CRLF, and case-insensitive fields parse") {
    val txt = "# policy\r\nUSER-AGENT: *\r\n\r\nDisAllow: /a # inline\r\nALLOW: /a/b\r\n"
    assert(rules(txt) == Set((false, "/a"), (true, "/a/b")))
  }

  test("consecutive UA headers share a group; UA after rules opens a new one") {
    val txt = "User-agent: alpha\nUser-agent: *\nDisallow: /x\n" +
      "User-agent: beta\nDisallow: /y\n"
    // '*' shares the first group with alpha -> /x only
    assert(rules(txt) == Set((false, "/x")))
    assert(rules(txt, "beta") == Set((false, "/y")))
    assert(rules(txt, "alpha") == Set((false, "/x")))
  }

  test("an exact-agent group shadows the wildcard group entirely") {
    val txt = "User-agent: *\nDisallow: /all\n\nUser-agent: me\nDisallow: /mine\n"
    assert(rules(txt, "me") == Set((false, "/mine")))
    assert(rules(txt, "other") == Set((false, "/all")))
    // shadowing applies even when the exact group is EMPTIER than '*'
    assert(allowed(txt, "https://example.com/all/page", "me"))
    assert(!allowed(txt, "https://example.com/all/page", "other"))
  }

  test("longest prefix wins; Allow wins a length tie") {
    val txt = "User-agent: *\nDisallow: /p/\nAllow: /p/ok\n" +
      "Allow: /q\nDisallow: /q\n"
    assert(!allowed(txt, "https://example.com/p/secret"))
    assert(allowed(txt, "https://example.com/p/ok/1"))
    // /q: allow and disallow same length -> allow
    assert(allowed(txt, "https://example.com/q/x"))
  }

  test("empty Disallow is a no-op; non-rule directives are dropped") {
    val txt = "User-agent: *\nDisallow:\nCrawl-delay: 10\nSitemap: https://x/s.xml\n"
    assert(rules(txt).isEmpty)
    assert(allowed(txt, "https://example.com/anything"))
  }

  test("no robots entry for a host, and the bare-root URL, are allowed") {
    val txt = "User-agent: *\nDisallow: /x\n"
    assert(allowed(txt, "https://other.org/x/1"))
    assert(allowed(txt, "https://example.com"))
    assert(!allowed(txt, "https://example.com/x?q=1#frag") == true)
  }

  test("query string participates in matching, fragment does not") {
    val txt = "User-agent: *\nDisallow: /s?bad=\n"
    assert(!allowed(txt, "https://example.com/s?bad=1"))
    assert(allowed(txt, "https://example.com/s?good=1"))
    assert(allowed(txt, "https://example.com/s#bad="))
  }

  test("filterAllowed preserves row multiplicity and drops only denied rows") {
    val txt = "User-agent: *\nDisallow: /no\n"
    val r = Robots.parseRules(Seq(("example.com", txt)).toDF("domain", "txt"),
      "domain", "txt")
    val urls = Seq(
      (1L, "https://example.com/ok"), (1L, "https://example.com/ok"),
      (2L, "https://example.com/no/1")
    ).toDF("id", "url")
    val out = Robots.filterAllowed(urls, "url", r).collect()
    assert(out.length == 2 && out.forall(_.getLong(0) == 1L))
  }

  test("the admission plan broadcasts rules — the URL side never shuffles") {
    val txt = "User-agent: *\nDisallow: /x\n"
    val r = Robots.parseRules(Seq(("example.com", txt)).toDF("domain", "txt"),
      "domain", "txt")
    val plan = Robots.annotateAllowed(
        spark.range(100).selectExpr("id", "concat('https://example.com/p/', id) AS url"),
        "url", r)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
