package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission (RFC 9309) — the politeness
  * gate of a crawl pipeline, sitting between the URL frontier
  * ([[UrlOps]]) and any fetch/content stage: a corpus-curation engine
  * that re-crawls or audits a crawl needs to answer "was this URL
  * fetchable for agent X" at corpus scale.
  *
  * Grammar implemented (the subset real corpora overwhelmingly use,
  * each simplification explicit):
  *  - `#` comments, blank lines, case-insensitive field names;
  *  - groups = consecutive `User-agent:` header lines + the
  *    Allow/Disallow lines after them (a UA line after a rule line
  *    starts a NEW group, per RFC);
  *  - group selection: all groups naming the agent EXACTLY (lowercased)
  *    if any exist, else all `*` groups — an agent-specific group
  *    SHADOWS the wildcard entirely, the RFC rule crawlers most often
  *    get wrong;
  *  - decision: longest-prefix match wins, Allow wins a length tie
  *    (Google semantics); no matching rule → allowed; empty
  *    `Disallow:` is a no-op.
  *  - NOT implemented: `*`/`$` wildcards inside paths and
  *    `Crawl-delay`/`Sitemap` extensions (dropped as non-rules).
  *
  * Scale shape: parsing explodes lines and runs ONE window partitioned
  * by domain — bounded work, robots bodies are KB by convention (the
  * fetcher truncates; 500 KiB is the RFC cap). The rules frame is
  * domains×rules rows — small data — and admission broadcast-joins it
  * on host, so the URL corpus itself never shuffles: a scan-speed
  * filter at 100 TB. */
object Robots {

  /** Parse robots.txt bodies into the rule set effective for one user
    * agent. Input: one row per (domain, robots body). Output:
    * (domain, allow, prefix, rule_len) — every Allow/Disallow of the
    * selected group(s), ready for [[annotateAllowed]]. */
  def parseRules(df: DataFrame, domainCol: String, txtCol: String,
                 userAgent: String = "*"): DataFrame = {
    val agent = userAgent.toLowerCase(java.util.Locale.ROOT)
    val lines = df.select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("pos", "raw")))
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .select(col("domain"), col("pos"),
        (lower(col("line")) rlike "^user-agent\\s*:").as("is_ua"),
        when(lower(col("line")) rlike "^user-agent\\s*:",
          lower(trim(regexp_replace(col("line"), "(?i)^user-agent\\s*:", ""))))
          .as("ua"),
        when(lower(col("line")) rlike "^(dis)?allow\\s*:",
          struct((lower(col("line")) rlike "^allow\\s*:").as("allow"),
            trim(regexp_replace(col("line"), "(?i)^(dis)?allow\\s*:", ""))
              .as("prefix"))).as("rule"))
      .where(col("is_ua") || col("rule").isNotNull)
    // group id: +1 at each UA line NOT preceded by another UA line —
    // consecutive UA headers share a group, a UA after rules opens one
    val byPos = Window.partitionBy("domain").orderBy("pos")
    val grouped = lines
      .withColumn("ua_start",
        (col("is_ua") && !coalesce(lag("is_ua", 1).over(byPos), lit(false)))
          .cast("int"))
      .withColumn("grp", sum("ua_start").over(byPos))
    // which groups apply: exact-agent groups shadow '*' groups
    val groupAgents = grouped.where(col("is_ua"))
      .groupBy("domain", "grp")
      .agg(max((col("ua") === agent).cast("int")).as("exact"),
           max((col("ua") === "*").cast("int")).as("star"))
    val domainHasExact = groupAgents.groupBy("domain")
      .agg(max("exact").as("has_exact"))
    val selected = groupAgents.join(domainHasExact, "domain")
      .where(when(col("has_exact") === 1, col("exact") === 1)
        .otherwise(col("star") === 1))
      .select("domain", "grp")
    grouped.where(col("rule").isNotNull && col("rule.prefix") =!= "")
      .join(selected, Seq("domain", "grp"))
      .select(col("domain"), col("rule.allow").as("allow"),
        col("rule.prefix").as("prefix"),
        length(col("rule.prefix")).as("rule_len"))
      .distinct()
  }

  /** URL path (leading slash, query included per RFC matching; no
    * fragment), "/" when absent. */
  private def pathOf(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val p = regexp_extract(noFrag, "^[^/]*//[^/?#]*(.*)$", 1)
    when(p === "", "/").otherwise(p)
  }

  /** Adds `allowed` to a URL frame: longest-prefix rule for the URL's
    * host decides, Allow wins length ties, no rule → allowed.
    *
    * Shape: rules collapse to ONE array-of-rules row per domain,
    * broadcast, 1:1 left join on host, and the decision is a per-row
    * higher-order fold (filter matching prefixes → array_max of
    * (len, allow) structs) — no fan-out, no re-aggregation, row
    * multiplicity untouched, scan-speed on the URL side. */
  def annotateAllowed(urls: DataFrame, urlCol: String,
                      rules: DataFrame): DataFrame = {
    val byDomain = rules.groupBy(col("domain").as("_host"))
      .agg(collect_list(struct(col("rule_len"), col("allow"),
        col("prefix"))).as("_rules"))
    val u = urls.withColumn("_host", UrlOps.host(col(urlCol)))
      .withColumn("_path", pathOf(col(urlCol)))
    u.join(broadcast(byDomain), Seq("_host"), "left")
      .withColumn("allowed", coalesce(
        // struct order = (rule_len, allow, …): longest wins, allow
        // beats disallow at equal length
        array_max(filter(col("_rules"),
          r => startswith(col("_path"), r.getField("prefix"))))
          .getField("allow"),
        lit(true)))
      .drop("_host", "_path", "_rules")
  }

  /** The filter form: only fetchable rows survive. */
  def filterAllowed(urls: DataFrame, urlCol: String,
                    rules: DataFrame): DataFrame =
    annotateAllowed(urls, urlCol, rules).where(col("allowed")).drop("allowed")
}
