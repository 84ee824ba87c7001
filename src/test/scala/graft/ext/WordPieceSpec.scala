package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** The HF-course WordPiece corpus: hug x10, pug x5, pun x12,
    * bun x4, hugs x5 — small enough to hand-compute every likelihood
    * score, rich enough to exercise the rational tie-breaks. */
  private def classicWords =
    Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("word", "freq")

  test("trainLocal: hand-computed likelihood argmax — rare-symbol " +
    "pairs beat raw pair counts, ties break code-point-lex") {
    // round 1 scores: every (x, ##u) pair and (##u, ##g) tie at 1/36;
    // (##g, ##s) = 5/(20*5) = 1/20 wins despite the LOWEST pair count
    // — the defining WordPiece selection
    val t = WordPiece.trainLocal(classicWords, numMerges = 2)
    assert(t.merges(0) ==
      WordPiece.Merge(1, "##g", "##s", "##gs", 5L, 20L, 5L))
    // round 2: ALL six pairs tie at exactly 1/36 — the lex tie-break
    // must pick ('##u', '##g') ('##u' < any unmarked char; '##g' <
    // '##gs' < '##n')
    assert(t.merges(1) ==
      WordPiece.Merge(2, "##u", "##g", "##ug", 15L, 36L, 15L))
    // alphabet: code-point-sorted initial symbols
    assert(t.alphabet ==
      Seq("##g", "##n", "##s", "##u", "b", "h", "p"))
    assert(t.vocab.toSet ==
      Set("##g", "##n", "##s", "##u", "b", "h", "p", "##gs", "##ug"))
  }

  test("scoreBeats is the exact rational order (property vs BigDecimal)") {
    val rng = new scala.util.Random(11)
    (1 to 500).foreach { _ =>
      def c() = rng.nextInt(1 << 20).toLong + 1L
      val (f1, a1, b1, f2, a2, b2) = (c(), c(), c(), c(), c(), c())
      val exact = WordPiece.scoreBeats(f1, a1, b1, f2, a2, b2)
      val dec =
        (BigDecimal(f1) / (BigDecimal(a1) * BigDecimal(b1))) >
          (BigDecimal(f2) / (BigDecimal(a2) * BigDecimal(b2)))
      assert(exact == dec, s"($f1,$a1,$b1) vs ($f2,$a2,$b2)")
    }
  }

  test("mergePassWp: greedy left-to-right non-overlapping, marker " +
    "stripped from the right side only") {
    assert(WordPiece.mergePassWp(
      Array("h", "##u", "##g"), "##u", "##g").toSeq ==
      Seq("h", "##ug"))
    // overlap chain: the middle occurrence is consumed by the first
    assert(WordPiece.mergePassWp(
      Array("##x", "##x", "##x"), "##x", "##x").toSeq ==
      Seq("##xx", "##x"))
    // unmarked left keeps the fused token unmarked
    assert(WordPiece.mergePassWp(
      Array("a", "##b", "##c"), "a", "##b").toSeq ==
      Seq("ab", "##c"))
  }

  test("greedy encode: LONGEST match first — the greedy path may " +
    "differ from merge order; OOV and over-budget words go [UNK]") {
    val vocab = WordPiece.trainLocal(classicWords, numMerges = 2).vocab
    val v = vocab.toSet
    // 'hugs': pos0 'h'; pos1 longest is '##ug' (not '##u'+'##gs' —
    // the merge-order path); pos3 '##s'
    assert(WordPiece.encodeWordLocal("hugs", v, 16) ==
      Seq("h", "##ug", "##s"))
    assert(WordPiece.encodeWordLocal("bug", v, 16) ==
      Seq("b", "##ug"))
    // OOV character mid-word fails the WHOLE word
    assert(WordPiece.encodeWordLocal("hux", v, 16) ==
      Seq(WordPiece.Unk))
    // a word whose FIRST char is unknown fails at position 0
    assert(WordPiece.encodeWordLocal("xug", v, 16) ==
      Seq(WordPiece.Unk))
    // over the word budget: [UNK], not an exclusion
    assert(WordPiece.encodeWordLocal("hug", v, 2) ==
      Seq(WordPiece.Unk))
    // empty word encodes to nothing
    assert(WordPiece.encodeWordLocal("", v, 16).isEmpty)
  }

  test("marker collision: '#'-bearing words are excluded from " +
    "training and fall back to [UNK] at encode — no vocab symbol " +
    "ever embeds a literal '#'") {
    val words = classicWords.union(
      Seq(("h#g", 100L), ("###", 50L)).toDF("word", "freq"))
    val t = WordPiece.trainLocal(words, numMerges = 2)
    // the huge-frequency marker words changed nothing
    assert(t.merges ==
      WordPiece.trainLocal(classicWords, numMerges = 2).merges)
    assert(t.vocab.forall(p =>
      !WordPiece.stripMarker(p).contains("#")))
    assert(WordPiece.encodeWordLocal("h#g", t.vocab.toSet, 16) ==
      Seq(WordPiece.Unk))
  }

  test("encodeScalable: distributed encode is word-for-word the local " +
    "greedy matcher; null text yields null tokens, null ids ride") {
    val vocab = WordPiece.trainLocal(classicWords, numMerges = 2).vocab
    val v = vocab.toSet
    val df = Seq(
      (Some(1L), "hug pug hugs"),
      (Some(2L), "bun pun hux"),
      (Some(3L), null.asInstanceOf[String]),
      (None: Option[Long], "hug")
    ).toDF("id", "text")
    val got = WordPiece.encodeScalable(df, "id", "text", vocab, 16)
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    def loc(t: String) = t.split(" ").toSeq
      .flatMap(w => WordPiece.encodeWordLocal(w, v, 16))
    assert(got(Some(1L)) == loc("hug pug hugs"))
    assert(got(Some(2L)) == loc("bun pun hux"))
    assert(got(Some(3L)) == null)
    assert(got(None) == loc("hug"))
  }

  test("artifact store round-trip: vocab set and geometry survive; " +
    "encode from the reloaded artifact is token-identical") {
    val trained = WordPiece.trainLocal(classicWords, numMerges = 2)
    val dir = specTempDir("wp-store").toString
    WordPiece.saveVocab(spark, dir, trained.vocab, maxWordLen = 7)
    val art = WordPiece.loadVocab(spark, dir)
    assert(art.vocab.toSet == trained.vocab.toSet)
    assert(art.maxWordLen == 7)
    val df = Seq((1L, "hugs bug hux"), (2L, "a-very-long-word-here"))
      .toDF("id", "text")
    val a = WordPiece.encodeWithArtifact(df, "id", "text", art)
      .orderBy("id").collect().map(_.getSeq[String](1)).toSeq
    val b = WordPiece.encodeScalable(df, "id", "text",
        trained.vocab, 7)
      .orderBy("id").collect().map(_.getSeq[String](1)).toSeq
    assert(a == b)
    // the 21-char word is over the budget: whole word [UNK]
    assert(a(1) == Seq(WordPiece.Unk))
  }

  test("store validation refuses: future version, zero word budget, " +
    "count mismatch, duplicate pieces") {
    val trained = WordPiece.trainLocal(classicWords, numMerges = 2)
    val dir = specTempDir("wp-store-bad").toString
    WordPiece.saveVocab(spark, dir, trained.vocab, maxWordLen = 16)
    // future version
    Seq((WordPiece.ArtifactVersion + 1, 16, trained.vocab.size))
      .toDF("version", "max_word_len", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    val e1 = intercept[IllegalArgumentException](
      WordPiece.loadVocab(spark, dir))
    assert(e1.getMessage.contains("format version"))
    // zero word budget (Row.getInt on NULL would silently yield 0)
    Seq((WordPiece.ArtifactVersion, 0, trained.vocab.size))
      .toDF("version", "max_word_len", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    val e2 = intercept[IllegalArgumentException](
      WordPiece.loadVocab(spark, dir))
    assert(e2.getMessage.contains("max_word_len"))
    // count mismatch (truncation)
    Seq((WordPiece.ArtifactVersion, 16, trained.vocab.size + 3))
      .toDF("version", "max_word_len", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    val e3 = intercept[IllegalArgumentException](
      WordPiece.loadVocab(spark, dir))
    assert(e3.getMessage.contains("truncated or mixed"))
    // duplicates refuse at SAVE time
    val e4 = intercept[IllegalArgumentException](
      WordPiece.saveVocab(spark, dir, Seq("a", "a"), 16))
    assert(e4.getMessage.contains("duplicate"))
  }

  test("decodeTokens inverts the ## algebra: decode(encode(text)) " +
    "equals the whitespace-normalized original for [UNK]-free text") {
    val vocab = WordPiece.trainLocal(classicWords, numMerges = 2).vocab
    val df = Seq(
      (1L, "hug   pug  hugs"), // runs of spaces normalize away
      (2L, "bun pun"),
      (3L, "hug hux bun")      // hux -> [UNK]: lossy by construction
    ).toDF("id", "text")
    val got = WordPiece.encodeScalable(df, "id", "text", vocab, 16)
      .withColumn("rec", WordPiece.decodeTokens(col("tokens")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "hug pug hugs")
    assert(got(2L) == "bun pun")
    assert(got(3L) == "hug [UNK] bun")
    // corpus differential: every [UNK]-free fixture document
    // round-trips exactly
    val docs = graft.Tables.documents(spark, sfDir)
    val fullVocab = WordPiece.trainLocal(
      Bpe.wordFreq(docs, "text"), numMerges = 8).vocab
    val rt = WordPiece.encodeScalable(docs, "doc_id", "text",
        fullVocab, 16)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(
        coalesce(size(filter(col("tokens"),
          t => t === WordPiece.Unk)), lit(0)).as("n_unk"),
        (WordPiece.decodeTokens(col("tokens")) ===
          array_join(filter(split(col("text"), " "),
            v => length(v) > 0), " ")).as("ok"))
      .collect()
    val unkFree = rt.filter(_.getInt(0) == 0)
    assert(unkFree.nonEmpty && unkFree.forall(_.getBoolean(1)))
  }

  test("trainLocal guards: row and byte caps name the remedy; " +
    "minFreq stops early when no pair qualifies") {
    val e1 = intercept[IllegalArgumentException](
      WordPiece.trainLocal(classicWords, numMerges = 2,
        maxVocabRows = 2))
    assert(e1.getMessage.contains("maxVocabRows"))
    val e2 = intercept[IllegalArgumentException](
      WordPiece.trainLocal(classicWords, numMerges = 2,
        maxVocabBytes = 10L))
    assert(e2.getMessage.contains("maxVocabBytes"))
    // minFreq above every pair count: zero merges, alphabet intact
    val t = WordPiece.trainLocal(classicWords, numMerges = 5,
      minFreq = 1000L)
    assert(t.merges.isEmpty && t.alphabet.nonEmpty)
    // more merges requested than pairs exist: stops when dry
    val tiny = Seq(("ab", 3L)).toDF("word", "freq")
    val t2 = WordPiece.trainLocal(tiny, numMerges = 50)
    assert(t2.merges.size == 1 &&
      t2.merges.head.token == "ab")
    // after the only merge, 'ab' is a single symbol — encode agrees
    assert(WordPiece.encodeWordLocal("ab", t2.vocab.toSet, 16) ==
      Seq("ab"))
  }

  test("incremental pair/unigram maintenance equals recompute-from-" +
    "scratch on the fixture vocabulary (differential, 8 merges)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("source") === "src0")
    val words = Bpe.wordFreq(docs, "text")
    val fast = WordPiece.trainLocal(words, numMerges = 8)
    // reference: retrain from scratch at every prefix length — the
    // first k merges of a k+1-merge run must be identical (greedy
    // training is prefix-stable), which fails if any incremental
    // count drifts
    (1 to 8).foreach { k =>
      val ref = WordPiece.trainLocal(words, numMerges = k)
      assert(ref.merges == fast.merges.take(k), s"prefix $k")
    }
  }
}
