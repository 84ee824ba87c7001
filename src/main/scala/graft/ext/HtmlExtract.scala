package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the first stage of every real crawl
  * pipeline (reference corpora arrive as markup; the quality/dedup/
  * language gates downstream all assume extracted text). Entirely
  * MAP-ONLY: a fixed chain of regex rewrites and one per-document line
  * explode — no shuffle until a caller aggregates, so the stage scales
  * with input bytes alone and fuses into the scan's codegen at 100 TB.
  *
  * The regex dialect is the shared Java-regex/RE2 subset (no
  * backreferences, no lookaround, inline `(?is)` flags, explicit
  * whitespace classes — Java's `\s` includes `\x0B`, RE2's does not),
  * so a DuckDB oracle replays every stage bit-for-bit. This is a
  * deliberately NAIVE extractor in the boilerpipe/jusText lineage —
  * regex-shaped, not a conforming HTML5 tree parser: a bare `<` in
  * running text eats to the next `>`, misnested anchors fall back to
  * counting as body text. Those are the standard trade-offs of
  * regex-level extraction; what matters at corpus scale is that the
  * behavior is deterministic, engine-independent, and linear.
  *
  * Stage order (each deterministic given the previous):
  *  1. raw-text containers: paired `<script>`/`<style>` blocks drop
  *     with their CONTENT (script text is code, not prose; runs before
  *     comment removal because script bodies legally contain `<!--`),
  *     then any unterminated open-to-EOF tail drops too — a truncated
  *     crawl must not leak half a script into the corpus.
  *  2. comments `<!-- ... -->` drop.
  *  3. block-level tags (`p`, `div`, `h1-6`, `li`, `tr`, `title`, …)
  *     become newlines — the line structure downstream quality signals
  *     key on.
  *  4. per line: visible text = strip remaining tags, decode the
  *     common named entities (`&amp;` LAST, standard single-pass
  *     order, so `&amp;lt;` decodes to the literal text `&lt;`),
  *     collapse whitespace, trim.
  *  5. per line: link density = share of visible characters
  *     contributed by `<a>…</a>` runs (anchor text AND the whitespace
  *     it absorbs), as an exact integer permil — THE boilerplate
  *     signal (nav bars and footers are link-dense, body prose is
  *     not; jusText's core heuristic).
  */
object HtmlExtract {

  /** Whitespace class shared by Java regex and RE2 (see scaladoc). */
  private val Ws = "[ \\t\\r\\n\\f]"

  private def rawTextRe(tag: String) =
    s"(?is)<$tag\\b[^>]*>.*?</$tag$Ws*>"
  private val UnterminatedRe = s"(?is)<(script|style)\\b[^>]*>.*"
  private val CommentRe = "(?s)<!--.*?-->"
  private val BlockTagRe =
    "(?i)</?(p|div|br|hr|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead" +
      "|tbody|tfoot|caption|blockquote|pre|section|article|aside|nav" +
      "|header|footer|figure|figcaption|form|fieldset|legend|title" +
      "|head|body|html)\\b[^>]*>"
  private val AnyTagRe = "(?s)<[^>]*>"
  private val AnchorRe = s"(?is)<a\\b[^>]*>.*?</a$Ws*>"

  /** Stages 1-2: drop script/style (paired, then unterminated-to-EOF)
    * and comments. */
  def stripNoise(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, rawTextRe("script"), ""),
          rawTextRe("style"), ""),
        UnterminatedRe, ""),
      CommentRe, "")

  /** Stage 3 on a noise-stripped document: block-level tags → '\n'.
    * SOURCE newlines are normalized to spaces first — in HTML they are
    * inter-word whitespace, not line structure (a paragraph wrapped at
    * 80 columns is still one line of text); only block tags break
    * lines. Inline tags (`a`, `b`, `span`, …) survive for the per-line
    * link signal; [[visibleText]] removes them. */
  def blockLines(stripped: Column): Column =
    regexp_replace(
      regexp_replace(stripped, "[\\t\\r\\n\\f]+", " "),
      BlockTagRe, "\n")

  /** Stage 4 on one line/fragment: remaining tags stripped, common
    * entities decoded (`&amp;` last), whitespace collapsed, trimmed. */
  def visibleText(fragment: Column): Column = {
    val noTags = regexp_replace(fragment, AnyTagRe, "")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&").foldLeft(noTags) { case (c, (from, to)) =>
      // literal replace via regexp_replace for engine parity — no
      // entity name contains a regex metachar, so the pattern IS the
      // literal in both dialects
      regexp_replace(c, from, to)
    }
    trim(regexp_replace(decoded, s"$Ws+", " "))
  }

  /** Stage 5 helper: the fragment with `<a>…</a>` runs (tags AND inner
    * text) removed — visible-length difference against the intact
    * fragment is the anchor-contributed character count. */
  def anchorStripped(fragment: Column): Column =
    regexp_replace(fragment, AnchorRe, "")

  /** Full extraction to LINES: one row per non-empty visible line —
    * `(idCol, line_no, line, link_permil)` where `line_no` is the
    * 0-based position in the block-split sequence (pre-filter, so
    * relative order survives the empty-line drop) and `link_permil`
    * is ⌊1000·anchor_chars/total_chars⌋ over visible characters.
    * Map-only + one generator; no shuffle. */
  def extractLines(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val lines = split(blockLines(stripNoise(col(htmlCol))), "\n")
    // the strip/extract regex chain costs µs per byte — orders beyond
    // what the exchange below costs — so buy compute-proportional
    // parallelism instead of inheriting byte-sized splits (Spread
    // scaladoc; the stage is otherwise map-only and fuses with the
    // repartition's read side)
    graft.ops.Spread.forCompute(df, col(idCol))
      .select(col(idCol), posexplode(lines).as(Seq("line_no", "raw")))
      .withColumn("line", visibleText(col("raw")))
      .withColumn("__noa", visibleText(anchorStripped(col("raw"))))
      .filter(length(col("line")) > 0)
      .select(col(idCol), col("line_no").cast("long").as("line_no"),
        col("line"),
        // exact integer permil: lengths are ints, `div` is integral —
        // no float rounding to desync an oracle (DuckDB twin: `//`)
        expr("((length(line) - length(__noa)) * CAST(1000 AS BIGINT)) " +
          "div CAST(length(line) AS BIGINT)").as("link_permil"))
  }

  /** Hyperlink extraction — the LINK-GRAPH stage: one row per `<a>` run
    * carrying an href, `(idCol, link_no, href, anchor)`. `link_no` is
    * the 0-based position among ALL `<a>` runs (href-less anchors are
    * dropped but still consume a number, so positions are stable under
    * partial markup). The href accepts double-quoted, single-quoted,
    * and bare attribute forms, is entity-decoded (`&amp;` in query
    * strings is the norm in real markup), and `anchor` is the run's
    * visible text ([[visibleText]]: inner tags stripped, entities
    * decoded, whitespace collapsed). Script/style/comment regions are
    * dropped FIRST, so commented-out or scripted markup contributes no
    * edges. Map-only + one generator; no shuffle — feeding a
    * PageRank/HITS stage, the edge list shuffles once on its own keys
    * and nothing here adds to that. */
  def links(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val runs = regexp_extract_all(stripNoise(col(htmlCol)),
      lit(AnchorRe), lit(0))
    val run = col("__run")
    def attr(re: String) = nullif(regexp_extract(run, re, 1), lit(""))
    val href = coalesce(
      attr(s"(?is)\\bhref$Ws*=$Ws*\"([^\"]*)\""),
      attr(s"(?is)\\bhref$Ws*=$Ws*'([^']*)'"),
      attr(s"(?is)\\bhref$Ws*=$Ws*([^\\s>\"']+)"))
    df.select(col(idCol), posexplode(runs).as(Seq("link_no", "__run")))
      .withColumn("href", visibleText(href)) // entity decode + trim
      .filter(col("href").isNotNull && col("href") =!= "")
      .select(col(idCol), col("link_no").cast("long").as("link_no"),
        col("href"), visibleText(run).as("anchor"))
  }

  /** jusText-style CONTEXT-FREE block classification — the
    * extraction-quality tier above the bare link-density cut: each
    * visible block from [[extractLines]] gets a verdict from the two
    * signals jusText's core keys on, link density and STOPWORD density
    * (boilerplate is link-dense OR function-word-poor; body prose is
    * neither). Decision order is jusText's own (Pomikálek 2011,
    * context-free part), all thresholds integral so a SQL oracle
    * replays every boundary exactly:
    *
    *  1. `link_permil > maxLinkPermil`            → `bad`
    *  2. `char_len < lenLow` and any link present → `bad`
    *     `char_len < lenLow` otherwise            → `short`
    *  3. `stop_permil >= stopHighPermil` and `char_len > lenHigh`
    *                                              → `good`
    *     `stop_permil >= stopHighPermil`          → `neargood`
    *  4. `stop_permil >= stopLowPermil`           → `neargood`
    *  5. else                                     → `bad`
    *
    * (`short`/`neargood` are the classes jusText's context-SENSITIVE
    * pass re-labels from neighbours; emitting them lets a caller apply
    * any neighbourhood policy as a window over `(id, line_no)`.)
    *
    * The stopword list is collected to a LITERAL array (bounded model
    * state, same carve-out as the trained-gate weights — a language's
    * function-word list is a few hundred entries; `maxStopwords` guards
    * the contract), normalized like the C4 wordlist gate (trim, lower,
    * whitespace-carrying entries dropped, distinct). The whole stage is
    * MAP-ONLY: extraction, token filter, and classification fuse into
    * one codegen'd pass — no shuffle, no join, linear in input bytes.
    *
    * Emits `(idCol, line_no, line, link_permil, n_words, stop_permil,
    * cls)`; `stop_permil = ⌊1000·stopword_tokens/words⌋` (non-empty
    * lines always have ≥ 1 token). */
  def justextBlocks(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: DataFrame, maxLinkPermil: Int = 200,
      lenLow: Int = 70, lenHigh: Int = 200,
      stopLowPermil: Int = 300, stopHighPermil: Int = 320,
      maxStopwords: Int = 100000): DataFrame = {
    require(maxLinkPermil >= 0 && maxLinkPermil <= 1000,
      s"justextBlocks: maxLinkPermil in [0,1000] ($maxLinkPermil)")
    require(lenLow >= 0 && lenHigh >= lenLow,
      s"justextBlocks: 0 <= lenLow <= lenHigh ($lenLow, $lenHigh)")
    require(stopLowPermil >= 0 && stopHighPermil >= stopLowPermil &&
      stopHighPermil <= 1000,
      s"justextBlocks: 0 <= low <= high <= 1000 " +
        s"($stopLowPermil, $stopHighPermil)")
    require(stopwords.columns.nonEmpty,
      "justextBlocks: stopword frame has no column")
    val sw = stopwords
      .select(lower(trim(col(stopwords.columns.head))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").rlike("\\s"))
      .distinct().orderBy("w")
      .collect().map(_.getString(0)).toIndexedSeq
    require(sw.size <= maxStopwords,
      s"justextBlocks: ${sw.size} stopwords exceeds maxStopwords=" +
        s"$maxStopwords — a function-word list is bounded; use the " +
        "keyed wordlistHits machinery for open vocabularies")
    val swLit = typedLit(sw)
    val toks = split(lower(col("line")), " ")
    val len = length(col("line"))
    extractLines(df, idCol, htmlCol)
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => array_contains(swLit, t))).cast("long"))
      .withColumn("stop_permil",
        expr("(n_stop * CAST(1000 AS BIGINT)) div n_words"))
      .withColumn("cls",
        when(col("link_permil") > maxLinkPermil, "bad")
          .when(len < lenLow,
            when(col("link_permil") > 0, "bad").otherwise("short"))
          .when(col("stop_permil") >= stopHighPermil,
            when(len > lenHigh, "good").otherwise("neargood"))
          .when(col("stop_permil") >= stopLowPermil, "neargood")
          .otherwise("bad"))
      .drop("n_stop")
  }

  /** jusText CONTEXT-SENSITIVE revision over a [[justextBlocks]]
    * frame: `good`/`bad` verdicts are anchors and keep their class;
    * each `short`/`neargood` block resolves against its nearest
    * anchors — `prev_cls` = nearest preceding anchor in the document
    * (document edge → `bad`, jusText's own default), `next_cls` =
    * nearest following. Both anchors good → `good`; both bad → `bad`;
    * mixed → `neargood` promotes to `good` (one good anchor adjacent
    * is enough for almost-prose), `short` demotes to `bad` (a short
    * block needs prose on BOTH sides to be a caption/heading worth
    * keeping). Deterministic given the block order, and every branch
    * is a window CASE a SQL oracle replays.
    *
    * Shape: ONE window over the document key — high-cardinality
    * partitioning (the per-doc block count is bounded by document
    * length), so the pass scales as a single doc-keyed shuffle; at
    * 100 TB that shuffle is shared with the reassembly aggregate that
    * almost always follows. Emits the input plus `prev_cls`,
    * `next_cls`, `final_cls`. */
  def justextRevise(blocks: DataFrame, idCol: String = "doc_id")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchor = when(col("cls").isin("good", "bad"), col("cls"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("line_no"))
    val prev = last(anchor, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val nxt = first(anchor, ignoreNulls = true)
      .over(w.rowsBetween(1, Window.unboundedFollowing))
    blocks
      .withColumn("prev_cls", coalesce(prev, lit("bad")))
      .withColumn("next_cls", coalesce(nxt, lit("bad")))
      .withColumn("final_cls",
        when(col("cls").isin("good", "bad"), col("cls"))
          .when(col("prev_cls") === "good" && col("next_cls") === "good",
            "good")
          .when(col("prev_cls") === "bad" && col("next_cls") === "bad",
            "bad")
          .when(col("cls") === "neargood", "good")
          .otherwise("bad"))
  }

  /** Full jusText extraction to one TEXT column per document:
    * [[justextBlocks]] → [[justextRevise]] → keep `final_cls = good` →
    * reassemble survivors in document order (in-row `sort_array`,
    * partitioning-independent — the [[extractText]] contract).
    * Documents with no good block drop. Emits
    * `(idCol, n_blocks, n_kept, text)`. */
  def justextText(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: DataFrame, maxLinkPermil: Int = 200,
      lenLow: Int = 70, lenHigh: Int = 200,
      stopLowPermil: Int = 300, stopHighPermil: Int = 320): DataFrame = {
    val revised = justextRevise(
      justextBlocks(df, idCol, htmlCol, stopwords, maxLinkPermil,
        lenLow, lenHigh, stopLowPermil, stopHighPermil), idCol)
    revised
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("final_cls") === "good", 1L).otherwise(0L))
          .as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(
              when(col("final_cls") === "good",
                struct(col("line_no"), col("line"))))),
            s => s.getField("line")),
          "\n").as("text"))
      .filter(col("n_kept") > 0L)
  }

  /** Extraction to one TEXT column per document, dropping link-dense
    * boilerplate lines (`link_permil > maxLinkPermil`) and rejoining
    * the survivors in document order with '\n'. One doc-keyed
    * aggregate (high-cardinality key — scale-safe); line order is
    * restored by an in-row `sort_array` on `(line_no, line)` structs,
    * so the result is partitioning-independent. Documents whose every
    * line was boilerplate (or empty) are dropped — quarantine them
    * upstream if they must be kept. */
  def extractText(df: DataFrame, idCol: String, htmlCol: String,
      maxLinkPermil: Int = 667): DataFrame = {
    require(maxLinkPermil >= 0 && maxLinkPermil <= 1000,
      s"extractText: maxLinkPermil in [0,1000] ($maxLinkPermil)")
    extractLines(df, idCol, htmlCol)
      .filter(col("link_permil") <= maxLinkPermil)
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")),
        "\n").as("text"))
  }
}
