package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded hostile-input fuzz over the crawl-stage COLUMN pipelines
  * (robots rules, sitemap entries, hyperlink extraction, frontier
  * decisions). These are declarative plans, not plain functions, so
  * the fuzz is BATCHED: thousands of generated tag-soup / directive-
  * soup rows flow through one job per family, and the assertions are
  * row-level invariants — never a throw, never a null in a contract
  * field, bounded output per input. The container-parser fuzz
  * (MultimodalFuzzSpec / WarcSpec) covers the byte-level parsers; this
  * is its markup-side sibling. */
class CrawlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7309L)
  private val tagAtoms = Seq("<a ", "href=", "\"", "'", ">", "</a>",
    "<url>", "</url>", "<loc>", "</loc>", "<lastmod>", "</lastmod>",
    "<urlset>", "<sitemapindex>", "<sitemap>", "</sitemap>", "<!--",
    "-->", "<script>", "</script>", "&amp;", "&lt;", "&#39;", "<",
    ">", "https://h.example/p", "/x?a=1", "text ", "\n", "\r\n", "=",
    "<a href=\"https://ok.example/\">ok</a>")
  private val robotsAtoms = Seq("User-agent:", "user-agent", "Allow:",
    "Disallow:", "Crawl-delay:", "Sitemap:", "*", "$", "bot", "/p/",
    "#c", ":", " ", "\n", "\r\n", "7", "-3", "fast", "/a(b)[c]{d}\\e",
    "Disallow: /q\n")

  private def soup(atoms: Seq[String], maxParts: Int): String =
    (0 until (1 + rnd.nextInt(maxParts)))
      .map(_ => atoms(rnd.nextInt(atoms.size))).mkString

  test("links + sitemap pipelines are total over 3000 tag-soup docs") {
    val docs = (0 until 3000)
      .map(i => (i.toLong, soup(tagAtoms, 24))).toDF("id", "html")
    val links = HtmlExtract.links(docs, "id", "html").collect()
    links.foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) >= 0L)
      assert(r.getString(2) != null && r.getString(2).nonEmpty) // href
      assert(r.getString(3) != null)                            // anchor
    }
    val entries = Sitemap.entries(
      docs.withColumnRenamed("html", "xml")
        .withColumnRenamed("id", "host")).collect()
    entries.foreach { r =>
      assert(r.getInt(2) >= 0)
      assert(r.getString(3) != null && r.getString(3).nonEmpty) // loc
    }
  }

  test("robots parse + frontier decision are total over 2000 soups") {
    val robots = (0 until 2000)
      .map(i => (s"h$i.example", soup(robotsAtoms, 30)))
      .toDF("host", "robots_txt")
    val rules = Robots.rules(robots)
    rules.collect().foreach { r =>
      assert(r.getString(1) != null)            // agent
      assert(r.getString(3).nonEmpty)           // pattern never empty
      assert(r.getLong(4) == r.getString(3).length.toLong) // spec
    }
    val delays = Robots.crawlDelays(robots, "bot").collect()
    delays.foreach(r => assert(r.getDouble(1) >= 0.0))
    // every host gets a verdict for every URL, even pattern-hostile ones
    val urls = (0 until 2000).map(i =>
      (i.toLong, s"https://h$i.example/p/${soup(Seq("a", "(", ")", "[",
        "]", "{", "}", "\\", "*", "$", "?", "x"), 6)}"))
      .toDF("id", "url")
    val verdicts = Robots.filterUrls(urls, rules, "bot")
    assert(verdicts.count() == 2000L)
    assert(verdicts.filter(col("allowed").isNull).count() == 0L)
  }
}
