package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-family) tokenizer suite — the second
  * production tokenizer family next to BPE, oracle-replayed END TO
  * END: the DuckDB side re-runs the substring seed, every Viterbi
  * lattice position (one MATERIALIZED CTE stage per position — each
  * stage is referenced by the next, so an inlining planner would
  * otherwise expand the chain exponentially; the BPE lesson), both
  * EM rounds, and the final Viterbi encode, and must land on the
  * identical piece table and token streams.
  *
  * The objective is the integer lexicographic one documented on
  * [[graft.ext.Unigram]] (fewest pieces, then largest count sum,
  * ties to the longest last piece — `v = sum(cnt) - n*2^40` as one
  * bigint), so the grade is hash-strict: a wrong tie-break, a
  * substring counted once per word instead of per position, a piece
  * that should have decayed out of the vocabulary, or one lattice
  * step taking the wrong back-pointer all flip the hash.
  *
  * NOTE the two dialect constraints this generator encodes (both
  * measured on DuckDB 1.0): chained RECURSIVE CTEs silently break
  * when a later recursion's correlated subquery joins a table derived
  * from an earlier recursion — hence the position-unrolled MATERIALIZED
  * stages; and `list_append` inside `struct_pack` named arguments
  * fails to bind — hence `||` list concatenation throughout.
  */
object UnigramQueries {

  /** Unroll budget: the DP runs one CTE stage per code-point
    * position. Words longer than this are excluded from training and
    * encoding on BOTH sides (the [[Unigram]] maxWordLen contract;
    * fixture words are <= 8 chars). */
  private[queries] val MaxWordLen = 16

  /** Piece-length ceiling, seed size and EM rounds of the graded
    * tokenizer — small enough that the unrolled oracle stays
    * readable, large enough that multi-char pieces dominate the
    * segmentation. */
  private[queries] val L = 4
  private[queries] val SeedN = 48
  private[queries] val Rounds = 2

  private val Big = 1099511627776L // 2^40, Unigram.Big

  /** One Viterbi DP over the words of CTE `src` (columns word, freq)
    * under score table `scores` (columns piece, cnt): MATERIALIZED
    * stages `u{tag}_1 .. u{tag}_{MaxWordLen}`, then `seg{tag}` with
    * the final segmentation list per word. Candidates at position j
    * are the pieces of length 1..min(L, j) ending there that EXIST in
    * the score table (single-char coverage is the caller's job: the
    * score table always carries the alphabet). */
  private def sqlViterbi(src: String, scores: String, tag: String)
      : String = {
    val b = Seq.newBuilder[String]
    b += s"""u${tag}_0 AS (
  SELECT word, freq, [struct_pack(v := CAST(0 AS BIGINT),
    seg := CAST([] AS VARCHAR[]))] AS d
  FROM $src)"""
    for (j <- 1 to MaxWordLen) {
      b += s"""u${tag}_$j AS MATERIALIZED (
  SELECT word, freq,
    CASE WHEN length(word) >= $j THEN
      d || [(SELECT arg_max(
        struct_pack(v := d[$j + 1 - c.l].v + c.cnt - $Big,
                    seg := d[$j + 1 - c.l].seg || [c.pc]),
        (d[$j + 1 - c.l].v + c.cnt) * 32 + c.l)
      FROM (SELECT ll.l AS l, sc.piece AS pc, sc.cnt AS cnt
        FROM (SELECT unnest(range(1, least($L, $j) + 1)) AS l) ll
        JOIN $scores sc ON sc.piece =
          substr(word, CAST($j + 1 - ll.l AS INT), CAST(ll.l AS INT)))
        c)]
    ELSE d END AS d
  FROM u${tag}_${j - 1})"""
    }
    b += s"""seg$tag AS MATERIALIZED (
  SELECT word, freq, d[length(word) + 1].seg AS seg
  FROM u${tag}_$MaxWordLen)"""
    b.result().mkString(",\n")
  }

  /** One EM round `r`: the Viterbi DP under `s{r-1}`, then the
    * freq-weighted segmentation counts, then the next score table
    * `s{r}` — alphabet chars always retained (count 0 allowed),
    * multi-char pieces only while their count stays positive. */
  private def sqlEmRound(r: Int): String =
    sqlViterbi("wf", s"s${r - 1}", r.toString) + s""",
c$r AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT unnest(seg) AS piece, freq FROM seg$r) GROUP BY 1),
s$r AS MATERIALIZED (
  SELECT a.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM alpha a LEFT JOIN c$r c USING (piece)
  UNION ALL
  SELECT piece, cnt FROM c$r WHERE length(piece) >= 2)"""

  /** The training front end: word frequencies of the src0 slice
    * (length-budgeted), the per-position substring seed, the alphabet
    * and the top-N multi-char candidates, and both EM rounds. Leaves
    * `s$Rounds` as the trained piece table. */
  private[queries] def sqlTrain: String = sqlTrainWf(None)

  /** [[sqlTrain]] with the `wf` word surface overridable — the
    * ▁-convention roundtrip grade feeds the MARKED surface through
    * the same seed + EM chain; `None` emits the standard text byte
    * for byte. */
  private[queries] def sqlTrainWf(wfOverride: Option[String]): String =
    wfOverride.getOrElse(
      s"""wf AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word
       |    FROM documents WHERE source = 'src0')
       |  WHERE length(word) > 0 AND length(word) <= $MaxWordLen
       |  GROUP BY 1)""".stripMargin) + ",\n" +
    s"""sub AS (
       |  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |    CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM (SELECT word, freq,
       |      unnest(range(1, length(word) + 1)) AS i FROM wf),
       |    (SELECT unnest(range(1, $L + 1)) AS l) ll
       |  WHERE i + l - 1 <= length(word)
       |  GROUP BY 1),
       |alpha AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub WHERE length(piece) = 1),
       |topn AS (
       |  SELECT piece, cnt FROM sub WHERE length(piece) >= 2
       |  ORDER BY cnt DESC, piece LIMIT $SeedN),
       |s0 AS MATERIALIZED (
       |  SELECT * FROM alpha UNION ALL SELECT * FROM topn),
       |""".stripMargin +
      (1 to Rounds).map(sqlEmRound).mkString(",\n")

  private def sqlH31(t: String): String = OracleSql.h31(t)

  /** The shared corpus-encode oracle front end (used by the encode,
    * score and store grades): the DISTINCT corpus words within the
    * length budget (`cw`), the trained table augmented with
    * zero-count fallback characters of the encode corpus (`se` — the
    * character-fallback contract: encoding is total on any text
    * within the budget) and the Viterbi DP over them (`sege`).
    * Consumers needing the per-document rejoin add
    * [[OracleSql.docWords]] with [[sqlWordFilter]]. */
  private[queries] def sqlEncodeOracle: String = sqlEncodeCw(None)

  /** [[sqlEncodeOracle]] with the `cw` word surface overridable (the
    * ▁-convention grade marks the DISTINCT corpus words); `None`
    * emits the standard text byte for byte. */
  private[queries] def sqlEncodeCw(cwOverride: Option[String]): String =
    cwOverride.getOrElse(
      s"""cw AS MATERIALIZED (
  SELECT word, CAST(1 AS BIGINT) AS freq FROM (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS word
    FROM documents)
  WHERE length(word) > 0 AND length(word) <= $MaxWordLen)""") + ",\n" +
    s"""se AS MATERIALIZED (
  SELECT piece, cnt FROM s$Rounds
  UNION ALL
  SELECT DISTINCT substr(word, CAST(i AS INT), 1) AS piece,
    CAST(0 AS BIGINT) AS cnt
  FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM cw)
  WHERE substr(word, CAST(i AS INT), 1) NOT IN
    (SELECT piece FROM s$Rounds)),
""" + sqlViterbi("cw", "se", "e")

  /** The unigram word contract: non-empty and within the lattice
    * budget — the filter [[OracleSql.docWords]] takes. */
  private[queries] def sqlWordFilter: String =
    s"length(v) > 0 AND length(v) <= $MaxWordLen"

  /** Per-document rejoin + token-stream reassembly over
    * [[sqlEncodeOracle]]'s CTEs — shared by the encode and store
    * grades (the score grade composes its own aggregation over
    * [[OracleSql.docWords]]). */
  private def sqlEncDoc: String =
    OracleSql.encDoc("sege", "seg", sqlWordFilter)

  /** The ▁-convention surfaces: originals capped one code point
    * short (the marked word must fit the lattice), content-▁ words
    * excluded (they would decode into phantom spaces — the WordPiece
    * `#` carve-out, same shape). */
  /** The marked-surface word contract in SQL, parameterized by the
    * binding name — the twin of `Unigram.includedMarked`, ONE
    * definition for the wf/cw CTEs and the rejoin filter. */
  private def sqlMarkedPred(v: String): String =
    s"length($v) > 0 AND length($v) <= ${MaxWordLen - 1}" +
      s" AND NOT contains($v, '▁')"

  private def sqlWfMarked: String =
    s"""wf AS MATERIALIZED (
  SELECT '▁' || word AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word
    FROM documents WHERE source = 'src0')
  WHERE ${sqlMarkedPred("word")}
  GROUP BY 1)"""

  private def sqlCwMarked: String =
    s"""cw AS MATERIALIZED (
  SELECT '▁' || word AS word, CAST(1 AS BIGINT) AS freq FROM (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS word
    FROM documents)
  WHERE ${sqlMarkedPred("word")})"""

  private def sqlMarkedFilter: String = sqlMarkedPred("v")

  val defs: Seq[QueryDef] = Seq(

    // The trained vocabulary itself, graded piece by piece: seed
    // selection, both EM re-estimations, alphabet retention and
    // multi-char decay — the full training state. Total order:
    // count desc, code-point-lexicographic piece.
    QueryDef("text_unigram_train",
      "WITH " + sqlTrain + s"""
SELECT piece, cnt AS freq FROM s$Rounds ORDER BY freq DESC, piece""") {
      (s, d) =>
      val pieces = Unigram.trainLocal(
        graft.ext.Bpe.wordFreq(
          Tables.documents(s, d).filter(col("source") === "src0"),
          "text"),
        maxPieceLen = L, seedSize = SeedN, emRounds = Rounds,
        maxWordLen = MaxWordLen)
      import s.implicits._
      pieces.map(p => (p.piece, p.freq)).toDF("piece", "freq")
        .orderBy(col("freq").desc, col("piece"))
    },

    // The 100 TB encode shape end to end: trainLocal on src0, then
    // the WHOLE corpus segmented map-only (broadcast piece table,
    // per-partition word memo). The oracle augments the trained table
    // with zero-count characters of the encode corpus (the
    // character-fallback contract — encoding is total on any text
    // within the length budget) and replays the lattice per DISTINCT
    // corpus word, then rejoins per document in word order. Per
    // document: piece count and the first five pieces.
    QueryDef("pipeline_unigram_encode",
      "WITH " + sqlTrain + ",\n" + sqlEncodeOracle + ",\n" +
        sqlEncDoc + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  coalesce(array_to_string(toks[1:5], '|'), '') AS head_pieces
FROM documents LEFT JOIN enc USING (doc_id)
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val pieces = Unigram.trainLocal(
        graft.ext.Bpe.wordFreq(docs.filter(col("source") === "src0"),
          "text"),
        maxPieceLen = L, seedSize = SeedN, emRounds = Rounds,
        maxWordLen = MaxWordLen)
      Unigram.encodeScalable(docs, "doc_id", "text", pieces,
          maxPieceLen = L, maxWordLen = MaxWordLen)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_pieces"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_pieces"))
        .orderBy("doc_id")
    },

    // LM-style document scoring under the trained table — the quality
    // signal a unigram tokenizer gives for free: the Viterbi
    // segmentation's total piece-count mass (documents that look like
    // the training distribution lean on high-count pieces) and its
    // zero-count fallback rate (OOV mass). Integer sufficient
    // statistics only (the standing float carve-out), one map-only
    // pass. The oracle scores each DISTINCT word through the same
    // lattice + augmented score table, then folds per document.
    QueryDef("text_unigram_score",
      "WITH " + sqlTrain + ",\n" + sqlEncodeOracle + ",\n" +
        OracleSql.docWords(sqlWordFilter) + s""",
wp AS (SELECT word, unnest(seg) AS piece FROM sege),
wsc AS (
  SELECT wp.word, CAST(COUNT(*) AS BIGINT) AS np,
    CAST(SUM(se.cnt) AS BIGINT) AS score,
    CAST(SUM(CASE WHEN se.cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM wp JOIN se USING (piece) GROUP BY 1),
agg AS (
  SELECT d.doc_id, CAST(SUM(s.np) AS BIGINT) AS n_pieces,
    CAST(SUM(s.score) AS BIGINT) AS total_score,
    CAST(SUM(s.oov) AS BIGINT) AS oov_pieces
  FROM dw d JOIN wsc s ON s.word = d.w
  GROUP BY 1)
SELECT doc_id,
  CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces,
  CAST(coalesce(total_score, 0) AS BIGINT) AS total_score,
  CAST(coalesce(oov_pieces, 0) AS BIGINT) AS oov_pieces
FROM documents LEFT JOIN agg USING (doc_id)
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val pieces = Unigram.trainLocal(
        graft.ext.Bpe.wordFreq(docs.filter(col("source") === "src0"),
          "text"),
        maxPieceLen = L, seedSize = SeedN, emRounds = Rounds,
        maxWordLen = MaxWordLen)
      Unigram.scoreScalable(docs, "doc_id", "text", pieces,
          maxPieceLen = L, maxWordLen = MaxWordLen)
        .orderBy("doc_id")
    },

    // UNIGRAM ARTIFACT STORE round-trip — the second tokenizer
    // family's ship-it grade, mirroring text_bpe_store: train on
    // src0, PERSIST the piece table + encoder geometry, RELOAD
    // (explicit schemas, version/count/uniqueness validation), and
    // encode the WHOLE corpus from the reloaded artifact.
    // piece_checksum is recomputed from the RELOADED rows (and by the
    // oracle from its own trained s2 CTE), so a store that drops,
    // duplicates or corrupts one piece or score flips the constant
    // column; a reloaded table that SEGMENTS differently flips every
    // token column.
    QueryDef("text_unigram_store",
      "WITH " + sqlTrain + s""",
mc AS (
  SELECT CAST(SUM(${sqlH31(
        "piece || ':' || CAST(cnt AS VARCHAR)")}) AS BIGINT)
    AS piece_checksum
  FROM s$Rounds),
""" + sqlEncodeOracle + ",\n" + sqlEncDoc + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  coalesce(array_to_string(toks[1:5], '|'), '') AS head_pieces,
  piece_checksum
FROM documents LEFT JOIN enc USING (doc_id), mc
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val trained = Unigram.trainLocal(
        graft.ext.Bpe.wordFreq(docs.filter(col("source") === "src0"),
          "text"),
        maxPieceLen = L, seedSize = SeedN, emRounds = Rounds,
        maxWordLen = MaxWordLen)
      // persist -> reload: the reloaded artifact (pieces + geometry)
      // drives everything below
      val dir = graft.Scratch.dir("unigram-store", d) + "/tokenizer"
      Unigram.savePieces(s, dir, trained, maxPieceLen = L,
        maxWordLen = MaxWordLen)
      val art = Unigram.loadPieces(s, dir)
      val checksum = art.pieces.map(p =>
        graft.ext.TextAnalysis.tokenHash31Local(
          s"${p.piece}:${p.freq}")).sum
      Unigram.encodeWithArtifact(docs, "doc_id", "text", art)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_pieces"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_pieces"),
          lit(checksum).as("piece_checksum"))
        .orderBy("doc_id")
    },

    // ▁-CONVENTION ROUND-TRIP (SentencePiece's word-boundary meta
    // symbol): train and encode over the MARKED surface — every word
    // ▁-prefixed, so the token stream itself carries word boundaries
    // — then decode (concat pieces, ▁ -> space, trim) and require the
    // whitespace-normalized original back for EVERY document on the
    // included-word surface. Unigram encoding is TOTAL (single-char
    // fallback), so unlike the WordPiece [UNK] grade there is no
    // lossy escape hatch: the Spark side raise_errors in-plan on any
    // non-null document that fails to reconstruct; the oracle
    // recomputes the same booleans from its own lattice walks. This
    // completes the losslessness triad (BPE byte alphabet, WordPiece
    // ##, unigram ▁).
    QueryDef("text_unigram_roundtrip",
      "WITH " + sqlTrainWf(Some(sqlWfMarked)) + ",\n" +
        sqlEncodeCw(Some(sqlCwMarked)) + ",\n" +
        OracleSql.docWords(sqlMarkedFilter, Some("'▁' || v")) + ",\n" +
        OracleSql.encJoin("sege", "seg") + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  coalesce(
    ltrim(replace(coalesce(array_to_string(toks, ''), ''), '▁', ' '))
    = array_to_string(list_filter(string_split(text, ' '),
        v -> $sqlMarkedFilter), ' '),
    FALSE) AS lossless
FROM documents LEFT JOIN enc USING (doc_id)
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val pieces = Unigram.trainLocal(
        Unigram.markWords(graft.ext.Bpe.wordFreq(
          docs.filter(col("source") === "src0"), "text"), MaxWordLen),
        maxPieceLen = L, seedSize = SeedN, emRounds = Rounds,
        maxWordLen = MaxWordLen)
      val enc = Unigram.encodeMarked(docs, "doc_id", "text", pieces,
        maxPieceLen = L, maxWordLen = MaxWordLen)
      val joined = docs
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .join(enc, Seq("doc_id"))
      val norm = array_join(filter(split(col("text"), " "),
        v => Unigram.includedMarked(v, MaxWordLen)), " ")
      val lossInner =
        coalesce(Unigram.decodePieces(col("tokens")) === norm,
          lit(false))
      joined.select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_pieces"),
          when(col("text").isNotNull && !lossInner,
            raise_error(concat(
              lit("unigram roundtrip violated for doc "),
              col("doc_id").cast("string"))).cast("boolean"))
            .otherwise(lossInner).as("lossless"))
        .orderBy("doc_id")
    }
  )
}
