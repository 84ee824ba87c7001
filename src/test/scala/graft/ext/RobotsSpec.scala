package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFC 9309 semantics the oracle fixture can't reach: wildcard and
  * end-anchor patterns, bare-Disallow no-rule, rules before any group,
  * unknown directives, no-robots hosts, and metacharacter-hostile
  * patterns that must not corrupt the regex translation. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def decide(robotsTxt: String, paths: Seq[String],
      agent: String = "bot"): Map[String, Boolean] = {
    val robots = Seq(("h.example", robotsTxt)).toDF("host", "robots_txt")
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, s"https://h.example$p") }
      .toDF("id", "url")
    Robots.filterUrls(urls, Robots.rules(robots), agent)
      .select("path", "allowed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  test("wildcard * spans any sequence") {
    val got = decide("User-agent: *\nDisallow: /private*/x",
      Seq("/private/x", "/private123/x", "/private/y", "/x"))
    assert(got == Map("/private/x" -> false, "/private123/x" -> false,
      "/private/y" -> true, "/x" -> true))
  }

  test("trailing $ anchors the end of the URL") {
    val got = decide("User-agent: *\nDisallow: /*.php$",
      Seq("/a.php", "/deep/b.php", "/a.php?q=1", "/a.phpx"))
    assert(got == Map("/a.php" -> false, "/deep/b.php" -> false,
      "/a.php?q=1" -> true, "/a.phpx" -> true))
  }

  test("regex metacharacters in patterns are literal") {
    val got = decide("User-agent: *\nDisallow: /a(b)+c?",
      Seq("/a(b)+c?d", "/abc", "/a(b)c"))
    assert(got == Map("/a(b)+c?d" -> false, "/abc" -> true,
      "/a(b)c" -> true))
    // metacharacters combined with a wildcard (the regex path): the
    // parens must be escaped while '*' still spans
    val got2 = decide("User-agent: *\nDisallow: /d(x)*z",
      Seq("/d(x)YYz", "/dxz"))
    assert(got2 == Map("/d(x)YYz" -> false, "/dxz" -> true))
  }

  test("bare Disallow is no rule; rules before any group are ignored") {
    val got = decide("Disallow: /pre\nUser-agent: *\nDisallow:",
      Seq("/pre/x", "/anything"))
    assert(got == Map("/pre/x" -> true, "/anything" -> true))
  }

  test("unknown directives are skipped, not group terminators") {
    val got = decide(
      "User-agent: *\nCrawl-delay: 10\nSitemap: https://h.example/s.xml\n" +
        "Disallow: /blocked",
      Seq("/blocked/x", "/ok"))
    assert(got == Map("/blocked/x" -> false, "/ok" -> true))
  }

  test("host without a robots row is fully allowed") {
    val robots = Seq(("other.example", "User-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt")
    val urls = Seq((0L, "https://h.example/x")).toDF("id", "url")
    val got = Robots.filterUrls(urls, Robots.rules(robots), "bot")
      .select("allowed").head().getBoolean(0)
    assert(got)
  }

  test("URL with no path gets path '/' and blanket rules apply") {
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt")
    val urls = Seq((0L, "https://h.example")).toDF("id", "url")
    val row = Robots.filterUrls(urls, Robots.rules(robots), "bot")
      .select("path", "allowed").head()
    assert(row.getString(0) == "/" && !row.getBoolean(1))
  }

  test("longest match wins across allow/disallow of different depth") {
    val got = decide(
      "User-agent: *\nAllow: /pub\nDisallow: /pub/secret",
      Seq("/pub/open", "/pub/secret/f"))
    assert(got == Map("/pub/open" -> true, "/pub/secret/f" -> false))
  }

  test("agent matching is case-insensitive and exact group shadows *") {
    val robots = Seq(("h.example",
      "User-agent: MyBot\nDisallow: /a\nUser-agent: *\nDisallow: /"))
      .toDF("host", "robots_txt")
    val urls = Seq((0L, "https://h.example/a/x"),
      (1L, "https://h.example/b")).toDF("id", "url")
    val got = Robots.filterUrls(urls, Robots.rules(robots), "mybot")
      .select("path", "allowed").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("/a/x" -> false, "/b" -> true))
  }

  test("frontier rows that already carry host/path columns are fine") {
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /a"))
      .toDF("host", "robots_txt")
    val urls = Seq((0L, "https://h.example/a/x", "stale.example", "/old"))
      .toDF("id", "url", "host", "path")
    val out = Robots.filterUrls(urls, Robots.rules(robots), "bot")
    // derived host/path win over the stale input columns, once each
    assert(out.columns.count(_ == "host") == 1)
    val row = out.select("host", "path", "allowed").head()
    assert(row.getString(0) == "h.example" &&
      row.getString(1) == "/a/x" && !row.getBoolean(2))
  }
}
