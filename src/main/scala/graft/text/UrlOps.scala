package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operations for web-crawl corpora — the front door of every
  * large-scale training-data pipeline (Common-Crawl-style processing
  * dedups by normalized URL and caps per-domain document counts
  * before any content filter runs).
  *
  * All scalar ops are codegen'd `functions._` chains (regexp/string
  * kernels, no UDFs) chosen for cross-engine replayability: every
  * rule is expressible in ANSI-ish SQL so the DuckDB oracle replays
  * bit-identical results. Reference behavior: the reference validates
  * URL-shaped fields with regex format checks (field_constraints in
  * newaugsver_clean.py); this module is that capability grown to the
  * corpus-processing scale the builder brief asks for.
  *
  * Scale shape: normalize/host/domain are scan-speed projections;
  * [[dedupByUrl]] shuffles one (url-hash, id) pair per row;
  * [[perDomainCap]] rides the bounded-heap top-k aggregate, so the
  * shuffle carries at most cap·tasks rows per domain however hot the
  * domain. Nothing is driver-side.
  */
object UrlOps {

  /** Conservative URL normalization:
    *  1. trim; drop the `#fragment`;
    *  2. strip tracking params (`utm_*`, `fbclid`, `gclid`) wherever
    *     they sit in the query string, then any dangling `?`/`&`;
    *  3. lowercase the scheme+authority (path/query stay cased —
    *     paths are case-sensitive by spec);
    *  4. drop explicit default ports `:80`/`:443`;
    *  5. drop a trailing `/` from the path.
    * Rules that need a full RFC 3986 resolver (dot-segment removal,
    * percent-encoding canonicalization, punycode) are intentionally
    * out: they change semantics on hostile input and no oracle could
    * replay them with string functions. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    // anchored to the [?&] separator so a longer param name (xutm_source)
    // never matches; a RUN of consecutive tracking params is one match
    // (the separator is consumed, so per-param matching would skip every
    // other param in a run). RE2-compatible — no lookbehind — so the
    // DuckDB oracle replays it verbatim.
    val noTrack1 = regexp_replace(noFrag,
      "([?&])(?:(?:utm_[a-z]+|fbclid|gclid)=[^&]*&)+", "$1")
    val noTrack = regexp_replace(noTrack1, "[?&](utm_[a-z]+|fbclid|gclid)=[^&]*$", "")
    val noDangle = regexp_replace(noTrack, "\\?$", "")
    val authority = regexp_extract(noDangle, "^([^/]*//[^/?#]*)", 1)
    val rest = regexp_extract(noDangle, "^[^/]*//[^/?#]*(.*)$", 1)
    val lowered = when(authority === "", noDangle)
      .otherwise(concat(lower(authority), rest))
    val noPort = concat(
      regexp_replace(regexp_extract(lowered, "^([^/]*//[^/?#]*)", 1), ":(80|443)$", ""),
      regexp_extract(lowered, "^[^/]*//[^/?#]*(.*)$", 1))
    val finalUrl = when(authority === "", lowered).otherwise(noPort)
    regexp_replace(finalUrl, "/$", "")
  }

  /** Lowercased host of a URL ("" when there is no `//authority`). */
  def host(url: Column): Column =
    lower(regexp_extract(trim(url), "^[^/]*//([^/:?#]+)", 1))

  /** Two-label public suffixes a corpus actually meets — the
    * registered domain of `www.bbc.co.uk` is `bbc.co.uk`, not
    * `co.uk`. The minimal NO-DATA fallback; the data-driven path is
    * [[registeredDomainPsl]] over the bundled snapshot (or a full PSL
    * via [[loadSuffixes]]). */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "co.in", "co.nz",
    "co.za", "co.kr", "com.au", "com.br", "com.cn", "com.mx", "com.tr",
    "com.ar", "com.sg")

  /** eTLD+1 (registered domain) of a host: last 3 labels when the
    * last 2 form a multi-part suffix, else last 2 labels; hosts with
    * fewer labels pass through whole. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n <= 2, hostCol)
      .when(last2.isin(multiPartSuffixes: _*) && n >= 3, last3)
      .otherwise(last2)
  }

  /** Multi-label public suffixes grouped by label count — the "full
    * public-suffix list is data, not code" path. Single-label TLDs
    * need no entry (the default last-2-labels rule covers them). */
  final case class SuffixList(byLabels: Map[Int, Seq[String]]) {
    def labelCounts: Seq[Int] = byLabels.keys.toSeq.sorted.reverse
  }

  /** Parse PSL-format lines: `//` comments and blanks skipped.
    * Wildcard (`*.`) and exception (`!`) rules are intentionally
    * unsupported — they cannot be expressed as a static IN set, and
    * the snapshot contains none; a full publicsuffix.org download
    * loses only those rules here. */
  def parseSuffixes(lines: Iterator[String]): SuffixList = {
    val entries = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .filterNot(l => l.startsWith("*") || l.startsWith("!"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq.distinct
    SuffixList(entries.groupBy(_.count(_ == '.') + 1).filter(_._1 >= 2))
  }

  /** Load a suffix list from a local PSL-format file (driver-side —
    * the list is model data like ANN centroids, kilobytes not rows). */
  def loadSuffixes(path: String): SuffixList = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseSuffixes(src.getLines()) finally src.close()
  }

  /** The bundled snapshot (resources/graft/public_suffix_snapshot
    * .dat): a ~600-entry subset of publicsuffix.org covering country
    * second-level registrations, US locality spaces, and the hosting
    * platforms a crawl meets. */
  lazy val bundledSuffixes: SuffixList = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    require(in != null, "public_suffix_snapshot.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parseSuffixes(src.getLines()) finally src.close()
  }

  /** Data-driven eTLD+1: longest-suffix-first match against a
    * [[SuffixList]] (default: the bundled snapshot). Each label count
    * becomes one codegen'd set-membership test (Catalyst `InSet` —
    * a hash probe, not a join), so the scan stays narrow at any list
    * size; hosts below 2 labels, or with no label above their longest
    * matching suffix, pass through whole. */
  def registeredDomainPsl(hostCol: Column,
                          psl: SuffixList = bundledSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    def lastK(k: Int) = concat_ws(".", slice(labels, -k, k))
    val matched = psl.labelCounts.foldLeft(null: Column) { (acc, k) =>
      val hit = (n >= k + 1) && lastK(k).isin(psl.byLabels(k): _*)
      if (acc == null) when(hit, lastK(k + 1)) else acc.when(hit, lastK(k + 1))
    }
    (if (matched == null) when(lit(false), hostCol) else matched)
      .when(n >= 2, lastK(2))
      .otherwise(hostCol)
  }

  /** Drop rows whose registered domain (eTLD+1 via
    * [[registeredDomainPsl]]) is on a blocklist — the standard crawl
    * hygiene gate (spam/adult/malware domain lists) that runs right
    * after URL dedup and before any content touch. Blocking by
    * REGISTERED domain means every subdomain of a listed domain is
    * blocked too, which is what domain blocklists mean. Scan-speed
    * narrow filter: the list folds into one codegen'd InSet probe, no
    * join, no shuffle (blocklists are thousands of entries — set
    * data, like the PSL). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    val dom = registeredDomainPsl(host(col(urlCol)))
    df.where(!dom.isin(blocked.map(_.toLowerCase(java.util.Locale.ROOT)): _*))
  }

  /** Exact URL dedup: keep the min-id row per [[normalizeUrl]]
    * equivalence class. Same min-id-survivor convention as
    * [[graft.ops.Dedup]]; ONE pass, one shuffle
    * ([[graft.ops.Dedup.keepFirstPerKey]] — the earlier
    * groupBy+semi-join shape executed the whole upstream subtree
    * twice, which a composed crawl pipeline pays at every stage). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    graft.ops.Dedup.keepFirstPerKey(df, normalizeUrl(col(urlCol)), idCol)

  /** Per-registered-domain document cap: keep at most `cap` rows per
    * domain, chosen by a deterministic content-keyed hash order
    * (md5-derived rank of the id — replayable in any engine, stable
    * under retries and repartitioning). The standard crawl-corpus
    * guard against one domain dominating the mixture.
    *
    * Scale shape: at crawl scale the whole POINT of this operator is
    * that a few domains are enormous, which is exactly the case a
    * per-domain `row_number` window cannot survive (the hottest
    * domain's every row funnels through one task's sort). This is the
    * single-pass payload-carrying heap ([[graft.expr.TopKRowsByScore]]):
    * one scan, map-side heaps reduce a hot domain to cap rows per
    * task, and the shuffle carries only partial winners — no
    * winner-join back to the source, no second scan. Rank is
    * [[graft.ops.Sampling.md5Hash40]] (salt 0), the same fold
    * kPerGroup uses, so any engine replays the selection. Inherits
    * its precondition: `idCol` long-castable and unique. */
  def perDomainCap(df: DataFrame, idCol: String, urlCol: String,
                   cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val srcCols = df.columns
    df.withColumn("_dom", registeredDomainPsl(host(col(urlCol))))
      .select(col("_dom"),
        (-graft.ops.Sampling.md5Hash40(col(idCol), 0L)).as("_r"),
        col(idCol).cast("long").as("_i"),
        struct(srcCols.map(col): _*).as("_p"))
      .groupBy("_dom")
      .agg(graft.expr.TopKRowsByScore.topKRowsBy(
        col("_r"), col("_i"), col("_p"), cap).as("_t"))
      .select(col("_dom").as("domain"), explode(col("_t")).as("_e"))
      .select(srcCols.map(c => col(s"_e.$c")) :+ col("domain"): _*)
  }
}
