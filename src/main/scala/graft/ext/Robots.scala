package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness filter — the crawl-frontier gate (RFC 9309,
  * the Robots Exclusion Protocol). Given a per-host `robots.txt` table
  * and a URL frontier, decides which URLs a named crawler may fetch.
  *
  * Semantics implemented (the RFC's normative core):
  *  - **Group parsing**: consecutive `User-agent:` lines form one
  *    group header; the `Allow`/`Disallow` rules that follow apply to
  *    every agent in the header. Comments (`#` to end of line), blank
  *    lines, unknown directives, and rules before any group header are
  *    ignored; field names are case-insensitive.
  *  - **Group selection**: a crawler uses its own agent's group(s) when
  *    any exist for the host, else the `*` group(s); never both.
  *  - **Rule matching**: a rule pattern matches path PREFIXES, with
  *    `*` as any-sequence wildcard and a trailing `$` anchoring the
  *    end. Longest (most-specific) matched pattern wins; on a tie,
  *    `Allow` beats `Disallow`. An empty pattern (bare `Disallow:`)
  *    is no rule. A URL with no matching rule — or a host with no
  *    robots.txt at all — is allowed.
  *
  * Scale shape: everything is declarative DataFrame ops — the parse is
  * explode + window over (host, line_no) (no UDF, no driver state),
  * and the frontier decision is ONE host-keyed join (rules tables are
  * rules-per-host small; broadcast when the host universe fits, hash
  * join keyed by host otherwise — either way the frontier table
  * streams through map-side). Literal-prefix rules (the overwhelming
  * real-world majority) match via a codegen'd `startswith`; only
  * wildcard/anchored patterns fall back to per-row regex.
  */
object Robots {

  /** Comment-stripped, classified, group-numbered directive lines:
    * (host, grp, field, value, is_ua). The shared front half of
    * [[rules]], [[crawlDelays]], and [[sitemaps]]. `fields` limits
    * which directives survive (all lower-case). */
  private def groupedDirectives(robots: DataFrame, hostCol: String,
      contentCol: String, fields: Seq[String]): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(contentCol), "\n")).as(Seq("line_no", "raw")))
      // strip comments, then whitespace; classify by the field name
      // before the FIRST ':' (values like sitemap URLs contain ':')
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("line") =!= "")
      .withColumn("field",
        lower(trim(substring_index(col("line"), ":", 1))))
      .withColumn("value",
        trim(expr("substring(line, instr(line, ':') + 1)")))
      .filter(col("field").isin(fields: _*) && col("line").contains(":"))
    val w = Window.partitionBy("host").orderBy("line_no")
    lines
      .withColumn("is_ua", (col("field") === "user-agent").cast("int"))
      .withColumn("prev_ua",
        coalesce(lag(col("is_ua"), 1).over(w), lit(0)))
      // a User-agent line NOT preceded by another one starts a group
      .withColumn("grp", sum(when(col("is_ua") === 1 &&
        col("prev_ua") === 0, 1).otherwise(0)).over(w))
  }

  /** Group selection shared by the rule and delay paths: keep the
    * exact agent's rows when the host has any, else the `*` rows. */
  private def selectAgent(df: DataFrame, agent: String): DataFrame =
    df.filter(col("agent").isin(agent, "*"))
      .withColumn("has_exact",
        max((col("agent") === agent).cast("int"))
          .over(Window.partitionBy("host")))
      .filter(when(col("has_exact") === 1, col("agent") === agent)
        .otherwise(col("agent") === "*"))
      .drop("has_exact")

  /** Parse per-host robots.txt content into a rule table:
    * (host, agent, allow, pattern, spec) — `spec` is the RFC's
    * specificity (pattern length). One row per (group-agent, rule).
    */
  def rules(robots: DataFrame, hostCol: String = "host",
      contentCol: String = "robots_txt"): DataFrame = {
    val grouped = groupedDirectives(robots, hostCol, contentCol,
      Seq("user-agent", "allow", "disallow"))
    val agents = grouped.filter(col("is_ua") === 1)
      .select(col("host"), col("grp"),
        lower(col("value")).as("agent"))
    val ruleRows = grouped
      .filter(col("is_ua") === 0 && col("grp") > 0 &&
        col("value") =!= "") // bare `Disallow:` is no rule
      .select(col("host"), col("grp"),
        (col("field") === "allow").as("allow"),
        col("value").as("pattern"),
        length(col("value")).cast("long").as("spec"))
    agents.join(ruleRows, Seq("host", "grp"))
      .select("host", "agent", "allow", "pattern", "spec")
  }

  /** Per-host `Crawl-delay` (the de-facto politeness extension; not in
    * RFC 9309 but honored by most crawlers) for `agent`, with the same
    * group semantics as [[filterUrls]]: the agent's own group(s) when
    * any exist, else the `*` group(s); several selected groups keep the
    * most conservative (max) delay. Hosts with no parseable delay are
    * absent — callers supply their default. Returns
    * (host, crawl_delay_sec DOUBLE). */
  def crawlDelays(robots: DataFrame, agent: String,
      hostCol: String = "host", contentCol: String = "robots_txt"): DataFrame = {
    require(agent.nonEmpty && agent == agent.toLowerCase,
      s"agent must be non-empty lowercase: '$agent'")
    val grouped = groupedDirectives(robots, hostCol, contentCol,
      Seq("user-agent", "crawl-delay"))
    val agents = grouped.filter(col("is_ua") === 1)
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val delays = grouped.filter(col("is_ua") === 0 && col("grp") > 0)
      .select(col("host"), col("grp"),
        // try_cast, not cast: ANSI mode makes a plain cast THROW on a
        // malformed delay value ("Crawl-delay: fast"), and hostile
        // robots.txt content must never kill the frontier job
        expr("try_cast(value AS double)").as("delay"))
      .filter(col("delay").isNotNull && col("delay") >= 0)
    selectAgent(agents.join(delays, Seq("host", "grp")), agent)
      .groupBy("host")
      .agg(max("delay").as("crawl_delay_sec"))
  }

  /** Host-level `Sitemap` URLs (group-independent per the protocol).
    * Returns (host, sitemap_url), distinct. */
  def sitemaps(robots: DataFrame, hostCol: String = "host",
      contentCol: String = "robots_txt"): DataFrame =
    groupedDirectives(robots, hostCol, contentCol, Seq("sitemap"))
      .filter(col("value") =!= "")
      .select(col("host"), col("value").as("sitemap_url"))
      .distinct()

  /** Does `path` match the RFC pattern in `pattern`? Prefix semantics,
    * `*` wildcard, trailing-`$` end anchor. Literal prefixes (no
    * metacharacter) stay a codegen'd `startswith`. */
  private def matches(path: Column, pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val core = when(anchored,
      pattern.substr(lit(1), length(pattern) - 1)).otherwise(pattern)
    // escape Java-regex metacharacters except '*', then '*' -> '.*'
    val esc = regexp_replace(core,
      lit("([.^$+?(){}\\[\\]|\\\\])"), lit("\\\\$1"))
    val rx = concat(lit("^"), regexp_replace(esc, lit("\\*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
    when(!pattern.contains("*") && !pattern.contains("$"),
      path.startsWith(pattern)).otherwise(regexp_like(path, rx))
  }

  /** Frontier gate: keep/drop decision per URL for `agent`.
    * Input needs `urlCol`; host and path are derived here. Returns the
    * input columns plus (host, path, allowed). Hosts with no robots
    * row and URLs with no matching rule are allowed.
    */
  def filterUrls(urls: DataFrame, ruleTable: DataFrame, agent: String,
      urlCol: String = "url", broadcastRules: Boolean = true): DataFrame = {
    require(agent.nonEmpty && agent == agent.toLowerCase,
      s"agent must be non-empty lowercase: '$agent'")
    // group selection: the agent's own rules when the host has any,
    // else the '*' rules — never both
    val mine = selectAgent(ruleTable, agent)
      .select("host", "allow", "pattern", "spec")
    val withPath = urls
      .withColumn("host", regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("path", coalesce(nullif(regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1), lit("")),
        lit("/")))
    val r = if (broadcastRules) broadcast(mine) else mine
    val joined = withPath.join(r, Seq("host"), "left_outer")
      .withColumn("__hit", col("pattern").isNotNull &&
        matches(col("path"), col("pattern")))
    // longest match wins; tie -> Allow wins (struct max orders by
    // spec, then allow: false < true). Input columns named host/path
    // were overwritten by the derivation above — dedup so a frontier
    // that already carries them doesn't double the grouping key.
    val keyCols = urls.columns
      .filterNot(c => c == "host" || c == "path")
      .map(col).toIndexedSeq :+ col("host") :+ col("path")
    joined.groupBy(keyCols: _*)
      .agg(max(when(col("__hit"),
        struct(col("spec"), col("allow")))).as("__best"))
      .withColumn("allowed",
        coalesce(col("__best.allow"), lit(true)))
      .drop("__best")
  }
}
