package graft.ops

import graft.SparkSpec
import graft.ext.Robots
import org.apache.spark.sql.functions._

/** Crawl-delay parsing (group semantics, hostile values) and the
  * frontier plan's wave/slot arithmetic. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("crawlDelays: exact group shadows *, max of selected groups") {
    val robots = Seq(
      ("a.example", "User-agent: mybot\nCrawl-delay: 7\n" +
        "User-agent: *\nCrawl-delay: 1"),
      ("b.example", "User-agent: *\nCrawl-delay: 2.5"),
      // two groups both naming mybot -> most conservative wins
      ("c.example", "User-agent: mybot\nCrawl-delay: 3\n" +
        "User-agent: mybot\nCrawl-delay: 9"),
      // unparseable and negative delays are ignored
      ("d.example", "User-agent: *\nCrawl-delay: fast\n" +
        "User-agent: *\nCrawl-delay: -4"),
      ("e.example", "User-agent: other\nCrawl-delay: 5"))
      .toDF("host", "robots_txt")
    val got = Robots.crawlDelays(robots, "mybot").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a.example" -> 7.0, "b.example" -> 2.5,
      "c.example" -> 9.0)) // d unparseable, e other-agent-only: absent
  }

  test("sitemaps: group-independent, distinct, full URL value kept") {
    val robots = Seq(
      ("a.example", "Sitemap: https://a.example/s1.xml\n" +
        "User-agent: *\nDisallow: /\n" +
        "Sitemap: https://a.example/s1.xml\n" +
        "Sitemap: https://a.example/s2.xml"))
      .toDF("host", "robots_txt")
    val got = Robots.sitemaps(robots).collect()
      .map(_.getString(1)).sorted.toSeq
    assert(got == Seq("https://a.example/s1.xml",
      "https://a.example/s2.xml"))
  }

  test("plan: waves sequence per host, slots honor per-host delay") {
    val urls = Seq(
      (0L, 30L, "a.example", "https://a.example/x"),
      (1L, 20L, "a.example", "https://a.example/y"),
      (2L, 10L, "a.example", "https://a.example/z"),
      (3L, 99L, "b.example", "https://b.example/only"))
      .toDF("id", "prio", "host", "url")
    val delays = Seq(("a.example", 4.0)).toDF("host", "crawl_delay_sec")
    val got = Frontier.plan(urls, delays,
        orderBy = Seq(col("prio").desc, col("id")))
      .select("id", "fetch_wave", "slot_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 0.0), (1L, 1L, 4.0), (2L, 2L, 8.0), // delay 4 paces a
      (3L, 0L, 0.0))) // b: no delay row -> default, wave 0 anyway
  }

  test("plan: equal priorities are deterministically tie-broken") {
    val urls = (0L until 20L)
      .map(i => (i, 5L, "a.example", s"https://a.example/$i"))
      .toDF("id", "prio", "host", "url")
    val delays = Seq.empty[(String, Double)].toDF("host", "crawl_delay_sec")
    val a = Frontier.plan(urls.repartition(3), delays,
        Seq(col("prio").desc, col("id")))
      .select("id", "fetch_wave").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Frontier.plan(urls.repartition(7), delays,
        Seq(col("prio").desc, col("id")))
      .select("id", "fetch_wave").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 20L))
  }

  test("plan contract: one host-keyed exchange, delays broadcast") {
    val urls = Seq((0L, 5L, "a.example", "https://a.example/x"))
      .toDF("id", "prio", "host", "url")
    val delays = Seq(("a.example", 2.0)).toDF("host", "crawl_delay_sec")
    val df = Frontier.plan(urls, delays, Seq(col("prio").desc, col("id")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(graft.ops.Bucketing.shuffleExchanges(df) == 1, plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
