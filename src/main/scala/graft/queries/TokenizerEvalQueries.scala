package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, Unigram, WordPiece}
import org.apache.spark.sql.functions._

/** Cross-family TOKENIZER EVALUATION — the table a data team produces
  * before committing a training freeze to one tokenizer: all THREE
  * production families (BPE, unigram-LM, WordPiece) trained on the
  * same src0 slice with their graded hyper-parameters, then run over
  * the WHOLE corpus, compared on integer sufficient statistics:
  *
  *  - `n_words` / `n_chars`: the word occurrences and code points the
  *    family encodes under ITS OWN contract (BPE and WordPiece take
  *    every word — WordPiece maps over-budget words to `[UNK]` —
  *    while the unigram lattice EXCLUDES words over its length
  *    budget; the denominators differ by design and are graded);
  *  - `n_tokens`: total tokens emitted — fertility is
  *    `n_tokens / n_words`, compression `n_chars / n_tokens`, both
  *    derivable exactly from the graded integers;
  *  - `n_oov`: the family's out-of-vocabulary mass — tokens outside
  *    the trained vocab (BPE: unseen characters ride through as
  *    singleton non-vocab tokens; unigram: zero-count character
  *    fallbacks; WordPiece: `[UNK]` emissions).
  *
  * The oracle replays ALL THREE trainers and encoders in one WITH
  * clause — the BPE merge chain under prefix `b`, the unigram
  * Viterbi-EM + lattice encode under its standard names, the
  * WordPiece likelihood argmax + greedy max-match under prefix `wp` —
  * then reduces each to the same four totals. Every statistic is a
  * freq-weighted integer sum, so the grade is hash-strict end to end
  * across three tokenizer trainings at once.
  */
object TokenizerEvalQueries {

  private def bpeChain: String =
    BpeQueries.sqlEncodeChainTables(
      (1 to BpeQueries.K).map("bm" + _))

  private def oracle: String = {
    val ctes = Seq(
      // the shared corpus word-frequency table (one occurrence-
      // weighted aggregation — every family's totals reduce over it)
      """evwf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) > 0 GROUP BY 1)""",
      // family 1: BPE (prefix b) — merge-chain training + encode
      BpeQueries.sqlTrainCtes(BpeQueries.K, " WHERE source = 'src0'",
        "b"),
      s"""bvocab AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT unnest(string_split(trim(w), '  ')) AS piece FROM bw0)
  ${(1 to BpeQueries.K).map(i => s"UNION SELECT a || b FROM bm$i")
          .mkString("\n  ")})""",
      s"""bpetok AS MATERIALIZED (
  SELECT freq, string_split(trim($bpeChain), '  ') AS toks
  FROM (SELECT word AS w, freq FROM evwf),
    ${(1 to BpeQueries.K).map("bm" + _).mkString(", ")})""",
      """bstat AS MATERIALIZED (
  SELECT CAST(SUM(x.freq) AS BIGINT) AS n_tokens,
    CAST(coalesce(SUM(CASE WHEN v.piece IS NULL THEN x.freq END), 0)
      AS BIGINT) AS n_oov
  FROM (SELECT freq, unnest(toks) AS t FROM bpetok) x
  LEFT JOIN bvocab v ON v.piece = x.t)""",
      // family 2: unigram-LM — the standard train + lattice-encode
      // oracle (unprefixed names, unique to this family)
      UnigramQueries.sqlTrain,
      UnigramQueries.sqlEncodeOracle,
      """uwsc AS MATERIALIZED (
  SELECT uwp.word, CAST(COUNT(*) AS BIGINT) AS np,
    CAST(SUM(CASE WHEN se.cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM (SELECT word, unnest(seg) AS piece FROM sege) uwp
  JOIN se USING (piece) GROUP BY 1)""",
      """ustat AS (
  SELECT CAST(SUM(e.freq * w.np) AS BIGINT) AS n_tokens,
    CAST(SUM(e.freq * w.oov) AS BIGINT) AS n_oov
  FROM evwf e JOIN uwsc w ON w.word = e.word)""",
      // family 3: WordPiece (prefix wp) — likelihood train + greedy
      // max-match encode
      WordPieceQueries.sqlTrainCtes("wp"),
      WordPieceQueries.sqlVocabCte("wp"),
      WordPieceQueries.sqlEncodeCtes("wp"),
      """wpstat AS (
  SELECT CAST(SUM(e.freq * len(s.toks)) AS BIGINT) AS n_tokens,
    CAST(SUM(e.freq * len(list_filter(s.toks, t -> t = '[UNK]')))
      AS BIGINT) AS n_oov
  FROM evwf e JOIN wpsegw s ON s.word = e.word)""",
      // denominators under each family's own word contract
      """allw AS (
  SELECT CAST(SUM(freq) AS BIGINT) AS n_words,
    CAST(SUM(freq * length(word)) AS BIGINT) AS n_chars FROM evwf)""",
      s"""uniw AS (
  SELECT CAST(SUM(freq) AS BIGINT) AS n_words,
    CAST(SUM(freq * length(word)) AS BIGINT) AS n_chars FROM evwf
  WHERE length(word) <= ${UnigramQueries.MaxWordLen})"""
    )
    "WITH " + ctes.mkString(",\n") + """
SELECT 'bpe' AS family, a.n_words, a.n_chars, b.n_tokens, b.n_oov
FROM allw a, bstat b
UNION ALL
SELECT 'unigram', u.n_words, u.n_chars, t.n_tokens, t.n_oov
FROM uniw u, ustat t
UNION ALL
SELECT 'wordpiece', a.n_words, a.n_chars, w.n_tokens, w.n_oov
FROM allw a, wpstat w
ORDER BY family"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("text_tokenizer_eval", oracle) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      // persist both word tables: the three trainers (guard agg +
      // collect each) and the denominator aggs otherwise re-run the
      // corpus-wide word-count shuffle ~7 times; cached, the corpus
      // is worded ONCE per table. Cache lifetime is the caller's
      // (Verify/Bench clear between queries — the standing contract)
      val wordsAll = Bpe.wordFreq(docs, "text").persist()
      val wordsSrc0 =
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text")
          .persist()

      // family denominators (one agg each; the word-frequency shuffle
      // is the only corpus-wide exchange either needs)
      val allW = wordsAll.agg(
        sum(col("freq")).cast("long").as("n_words"),
        sum(col("freq") * length(col("word"))).cast("long")
          .as("n_chars"))
      val uniW = wordsAll
        .filter(length(col("word")) <= UnigramQueries.MaxWordLen)
        .agg(sum(col("freq")).cast("long").as("n_words"),
          sum(col("freq") * length(col("word"))).cast("long")
            .as("n_chars"))

      // BPE: map-only broadcast encode; OOV = tokens outside the
      // trained vocab (alphabet ∪ merge products) — unseen characters
      // ride through as singleton non-vocab tokens
      val bMerges = Bpe.trainLocal(wordsSrc0, BpeQueries.K)
      val bVocab = wordsSrc0
        .select(explode(Bpe.symbols(Bpe.delimit(col("word"))))
          .as("vp"))
        .union(bMerges.map(m => m.left + m.right).toDF("vp"))
        .distinct()
      val bStat = Bpe.encodeScalable(docs, "doc_id", "text", bMerges)
        .select(explode(col("tokens")).as("t"))
        .join(broadcast(bVocab), col("t") === col("vp"), "left")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(when(col("vp").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_oov"))

      // unigram: the lattice scorer's integer sufficient statistics
      val uPieces = Unigram.trainLocal(wordsSrc0,
        maxPieceLen = UnigramQueries.L,
        seedSize = UnigramQueries.SeedN,
        emRounds = UnigramQueries.Rounds,
        maxWordLen = UnigramQueries.MaxWordLen)
      val uStat = Unigram.scoreScalable(docs, "doc_id", "text",
          uPieces, maxPieceLen = UnigramQueries.L,
          maxWordLen = UnigramQueries.MaxWordLen)
        .agg(sum(col("n_pieces")).cast("long").as("n_tokens"),
          sum(col("oov_pieces")).cast("long").as("n_oov"))

      // WordPiece: greedy max-match; OOV = [UNK] emissions
      val wpT = WordPiece.trainLocal(wordsSrc0, WordPieceQueries.K)
      val wpStat = WordPiece.encodeScalable(docs, "doc_id", "text",
          wpT.vocab, WordPieceQueries.MaxWordLen)
        .select(explode(col("tokens")).as("t"))
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(when(col("t") === WordPiece.Unk, 1L).otherwise(0L))
            .cast("long").as("n_oov"))

      def row(family: String, w: org.apache.spark.sql.DataFrame,
          t: org.apache.spark.sql.DataFrame) =
        w.crossJoin(t).select(lit(family).as("family"),
          col("n_words"), col("n_chars"), col("n_tokens"),
          col("n_oov"))
      row("bpe", allW, bStat)
        .union(row("unigram", uniW, uStat))
        .union(row("wordpiece", allW, wpStat))
        .orderBy("family")
    }
  )
}
