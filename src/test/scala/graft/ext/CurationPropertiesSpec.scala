package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style invariants across the curation operators, driven by
  * seeded random tag soup (one DataFrame of generated docs per test —
  * whole-frame assertions, not per-sample jobs). These pin the
  * ALGEBRA of the stages, complementary to the exact-value specs:
  * line dedup is idempotent and kills line repetition, extraction is
  * total on hostile markup with permils in range, soft dedup only
  * ever drops rows, hit counts are bounded by token counts. */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded tag-soup generator: text runs, valid/broken tags, block
    * tags, entities, anchors, control chars, quotes — hostile by
    * construction, reproducible by seed. */
  private def soup(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val frag = Array(
      "plain words here", "<p>", "</p>", "<div class=\"x\">", "</div>",
      "<script>var a=\"<p>\";", "</script>", "<!--", "-->", "<a href=\"/x\">",
      "</a>", "&amp;", "&lt;", "&nosuch;", "a < b", "c > d", "<<<", ">>>",
      "<li>", "</li>", "\n", "\t", "  ", "<P>", "</P>", "<br/>", "&#39;",
      "xy", "tail end.", "Quite! a? sentence.", "### ...",
      "<style>p{c:1}", "</style>", "<h1 title=\"a>b\">", "</h1>")
    (0L until n.toLong).map { i =>
      val parts = (0 until 3 + rnd.nextInt(25)).map(_ =>
        frag(rnd.nextInt(frag.length)))
      (i, parts.mkString(rnd.nextInt(3) match {
        case 0 => "" case 1 => " " case _ => "\n"
      }))
    }
  }

  test("extraction is total on 200 seeded tag-soup docs: no throw, no " +
    "empty line survives, link_permil always in [0, 1000]") {
    val df = soup(200, 0xC0FFEE).toDF("id", "html")
    val lines = HtmlExtract.extractLines(df, "id", "html")
      .select("id", "line", "link_permil")
      .as[(Long, String, Long)].collect()
    assert(lines.forall(_._2.nonEmpty))
    assert(lines.forall(l => l._3 >= 0L && l._3 <= 1000L),
      lines.filter(l => l._3 < 0 || l._3 > 1000).take(3).mkString)
  }

  test("dedupDocLines is idempotent, and line repetition measured " +
    "after it is identically zero") {
    val extracted = HtmlExtract.extractText(
      soup(200, 0xBEEF).toDF("id", "html"), "id", "html",
      maxLinkPermil = 1000)
    val once = TextAnalysis.dedupDocLines(extracted, "id", "text")
    val twice = TextAnalysis.dedupDocLines(
      once.select("id", "text"), "id", "text")
    val a = once.select("id", "text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val b = twice.select("id", "text", "n_kept")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "second application must be the identity")
    // a deduped doc has zero repeated lines by construction
    val rep = TextAnalysis.lineRepetitionStats(
      once.select(col("id"), explode(split(col("text"), "\n"))
        .as("line")), "id", "line")
    val dups = rep.filter(col("n_dup_lines") =!= 0L).count()
    assert(dups == 0L)
  }

  test("softDedupSample only drops rows (survivors are a subset, " +
    "dup_count >= 1, per-group survivors <= group size)") {
    // low-entropy texts force collisions
    val rnd = new scala.util.Random(42)
    val docs = (0L until 300L).map(i =>
      (i, s"content ${rnd.nextInt(7)}")).toDF("id", "t")
    val out = Dedup.softDedupSample(docs, "id", "t")
      .select("id", "t", "dup_count")
      .as[(Long, String, Long)].collect()
    val in = docs.as[(Long, String)].collect().toMap
    assert(out.forall(r => in.get(r._1).contains(r._2)))
    assert(out.forall(_._3 >= 1L))
    val groupSizes = in.values.groupBy(identity).map { case (t, g) =>
      t -> g.size }
    out.groupBy(_._2).foreach { case (t, g) =>
      assert(g.length <= groupSizes(t))
      // dup_count is the true group size, not a survivor count
      assert(g.forall(_._3 == groupSizes(t).toLong))
    }
  }

  test("wordlistHits bounds: hits <= tokens, hit_permil in [0, 1000], " +
    "every input row annotated exactly once") {
    val docs = soup(150, 0xD00D).toDF("id", "t")
    val wl = Seq("words", "plain", "###").toDF("word")
    val got = TextAnalysis.wordlistHits(docs, "id", "t", wl)
      .select("id", "tokens", "hits", "hit_permil")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 150)
    assert(got.map(_._1).distinct.length == 150)
    assert(got.forall(r => r._3 >= 0L && r._3 <= r._2))
    assert(got.forall(r => r._4 >= 0L && r._4 <= 1000L))
  }

  test("sentences: a document with no terminal punctuation yields at " +
    "most one sentence; permils bounded on tag soup") {
    val noPunct = Seq((1L, "just some words"), (2L, "   "), (3L, ""))
      .toDF("id", "t")
    val n = TextAnalysis.sentenceStatsDf(noPunct, "id", "t")
      .select("id", "n_sentences").as[(Long, Long)].collect().toMap
    assert(n(1L) == 1L && n(2L) == 0L && n(3L) == 0L)
    val stats = TextAnalysis.sentenceStatsDf(
        soup(150, 0xFACE).toDF("id", "t"), "id", "t")
      .select("terminal_permil").as[Long].collect()
    assert(stats.forall(p => p >= 0L && p <= 1000L))
  }
}
