package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece tokenizer suite — the third production tokenizer family
  * (Schuster & Nakajima 2012; BERT) next to BPE and unigram-LM,
  * oracle-replayed END TO END: the DuckDB side re-runs every training
  * iteration (adjacent-pair count, symbol unigram count, the exact
  * rational likelihood argmax `f/(fa*fb)` via HUGEINT
  * cross-multiplication in a NOT-EXISTS anti-beat predicate, greedy
  * merge apply with the `##` marker algebra) and the greedy
  * longest-match-first encode (one MATERIALIZED CTE stage per word
  * position, `[UNK]` total-word fallback), and must land on the
  * identical merge table, vocab and token streams.
  *
  * Everything is integral or exact-string (the likelihood ratio is
  * never materialized — only cross-multiplied), so the grade is
  * hash-strict: a wrong tie-break, a score compared in floating
  * point, a marker stripped from the wrong side, a shorter-than-
  * longest greedy match or a missing `[UNK]` fallback all flip the
  * hash.
  */
object WordPieceQueries {

  /** Merges of the graded tokenizer — same budget as the BPE grade:
    * deep enough that merged symbols feed later merges. */
  private[queries] val K = 12

  /** Greedy-encode unroll budget: one CTE stage per code-point
    * position; LONGER words map to `[UNK]` on both sides (the
    * `max_input_chars_per_word` contract — NOT an exclusion, the
    * contract difference from the unigram grade; fixture words are
    * <= 8 chars). */
  private[queries] val MaxWordLen = 16

  private def sqlH31(t: String): String = OracleSql.h31(t)

  /** `left + strip##(right)` of merge-CTE columns — the fused token. */
  private def sqlFused(a: String, b: String): String =
    s"$a || CASE WHEN $b LIKE '##%' THEN substr($b, 3) ELSE $b END"

  /** Generated SQL replay of [[WordPiece.trainLocal]]: `K` chained
    * stages over the word-frequency table of `documents.src0`. Stage
    * `i` leaves CTEs `m{i}` (the winning merge with its integer score
    * evidence) and `w{i}` (the delimited vocab after applying it).
    * Words containing `#` are excluded (the marker-collision
    * carve-out documented on [[WordPiece]]). */
  private[queries] def sqlTrainCtes(cte: String = ""): String = {
    val b = Seq.newBuilder[String]
    b += s"""${cte}wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word
    FROM documents WHERE source = 'src0')
  WHERE length(word) > 0 AND word NOT LIKE '%#%' GROUP BY 1)"""
    // delimited initial segmentation " a  ##b  ##c ": first char
    // plain, continuation chars ##-marked (single-space edges,
    // double-space interiors — the Bpe-oracle string algebra)
    b += s"""${cte}w0 AS MATERIALIZED (
  SELECT ' ' || substr(word, 1, 1) || ' ' ||
    CASE WHEN length(word) >= 2 THEN
      regexp_replace(substr(word, 2), '(.)', ' ##\\1 ', 'g')
    ELSE '' END AS w, freq
  FROM ${cte}wf)"""
    for (i <- 1 to K) {
      b += s"""${cte}p$i AS MATERIALIZED (
  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS f FROM (
    SELECT unnest(list_transform(range(1, len(l)),
        j -> struct_pack(a := l[j], b := l[j+1]))) AS p, freq
    FROM (SELECT string_split(trim(w), '  ') AS l, freq FROM ${cte}w${i - 1}))
  GROUP BY 1, 2)"""
      b += s"""${cte}u$i AS MATERIALIZED (
  SELECT s, CAST(SUM(freq) AS BIGINT) AS f FROM (
    SELECT unnest(string_split(trim(w), '  ')) AS s, freq FROM ${cte}w${i - 1})
  GROUP BY 1)"""
      b += s"""${cte}sc$i AS MATERIALIZED (
  SELECT p.a, p.b, p.f, ua.f AS fa, ub.f AS fb
  FROM ${cte}p$i p JOIN ${cte}u$i ua ON ua.s = p.a JOIN ${cte}u$i ub ON ub.s = p.b)"""
      // exact rational argmax f/(fa*fb): p wins iff no q strictly
      // beats it by cross-multiplication, nor ties with a smaller
      // (a, b) — binary collation, HUGEINT-exact
      b += s"""${cte}m$i AS MATERIALIZED (
  SELECT a, b, f, fa, fb FROM ${cte}sc$i p
  WHERE NOT EXISTS (SELECT 1 FROM ${cte}sc$i q WHERE
    CAST(q.f AS HUGEINT) * p.fa * p.fb >
      CAST(p.f AS HUGEINT) * q.fa * q.fb
    OR (CAST(q.f AS HUGEINT) * p.fa * p.fb =
          CAST(p.f AS HUGEINT) * q.fa * q.fb
        AND (q.a < p.a OR (q.a = p.a AND q.b < p.b)))))"""
      b += s"""${cte}w$i AS MATERIALIZED (
  SELECT replace(w, ' ' || m.a || '  ' || m.b || ' ',
                 ' ' || ${sqlFused("m.a", "m.b")} || ' ') AS w, freq
  FROM ${cte}w${i - 1}, ${cte}m$i m)"""
    }
    b.result().mkString(",\n")
  }

  /** The final vocabulary SET: the initial alphabet (every symbol of
    * `w0`) plus all K merged tokens — UNION-deduplicated, because two
    * merges can fuse to the same surface string. */
  private[queries] def sqlVocabCte(cte: String = ""): String =
    s"""${cte}vocab AS MATERIALIZED (
  SELECT DISTINCT piece FROM (
    SELECT unnest(string_split(trim(w), '  ')) AS piece FROM ${cte}w0)
  ${(1 to K).map(i =>
        s"UNION SELECT ${sqlFused("a", "b")} AS piece FROM ${cte}m$i")
        .mkString("\n  ")})"""

  /** Greedy longest-match-first encode of the DISTINCT corpus words
    * (`cw`), one MATERIALIZED stage per position: the walker state is
    * `(pos, toks, failed)`; stage j, when the walker sits at j, takes
    * the LONGEST vocab piece matching there (`##`-prefixed after
    * position 1) or fails the whole word. Leaves `segw` with the
    * final token list per word (`['[UNK]']` for failed or
    * over-budget words). */
  private[queries] def sqlEncodeCtes(cte: String = ""): String = {
    val b = Seq.newBuilder[String]
    b += s"""${cte}cw AS MATERIALIZED (
  SELECT word FROM (
    SELECT DISTINCT unnest(string_split(text, ' ')) AS word
    FROM documents)
  WHERE length(word) > 0)"""
    b += s"""${cte}e0 AS (
  SELECT word, struct_pack(pos := CAST(1 AS BIGINT),
    toks := CAST([] AS VARCHAR[]),
    failed := (length(word) > $MaxWordLen)) AS st
  FROM ${cte}cw)"""
    for (j <- 1 to MaxWordLen) {
      val probe =
        if (j == 1) s"substr(word, 1, CAST(ll.l AS INT))"
        else s"'##' || substr(word, $j, CAST(ll.l AS INT))"
      b += s"""${cte}e$j AS MATERIALIZED (
  SELECT word, CASE
    WHEN st.failed OR st.pos != $j OR length(word) < $j THEN st
    ELSE coalesce(
      (SELECT arg_max(struct_pack(
          pos := CAST($j + c.l AS BIGINT),
          toks := st.toks || [c.pc],
          failed := false), c.l)
       FROM (SELECT ll.l AS l, v.piece AS pc
         FROM (SELECT unnest(range(1, length(word) - $j + 2)) AS l) ll
         JOIN ${cte}vocab v ON v.piece = $probe) c),
      struct_pack(pos := st.pos, toks := st.toks, failed := true))
    END AS st
  FROM ${cte}e${j - 1})"""
    }
    b += s"""${cte}segw AS MATERIALIZED (
  SELECT word, CASE WHEN st.failed OR st.pos <= length(word)
    THEN ['[UNK]'] ELSE st.toks END AS toks
  FROM ${cte}e$MaxWordLen)"""
    b.result().mkString(",\n")
  }

  /** Per-document word rejoin + token-stream reassembly — the shared
    * [[OracleSql.encDoc]] algebra; every word participates (the
    * WordPiece contract — over-budget words arrive as `[UNK]`). */
  private def sqlEncDoc: String = OracleSql.encDoc("segw", "toks")

  /** The shared Spark-side front end: train on src0 with the one
    * word-count shuffle, return the trained tokenizer. */
  private def trained(s: org.apache.spark.sql.SparkSession, d: String)
      : WordPiece.Trained = {
    val t = WordPiece.trainLocal(
      graft.ext.Bpe.wordFreq(
        Tables.documents(s, d).filter(col("source") === "src0"),
        "text"),
      numMerges = K)
    // trainLocal stops early when pairs run dry; the K-stage unrolled
    // oracle would then cross-join an EMPTY m{i} and silently empty
    // the whole result — fail loudly with a named error instead
    require(t.merges.size == K,
      s"WordPieceQueries: corpus yielded ${t.merges.size} merges, " +
        s"oracle chain requires exactly $K")
    t
  }

  val defs: Seq[QueryDef] = Seq(

    // The learned merge table with its integer score evidence, graded
    // merge by merge: pair count over the product of the symbol
    // unigram counts — a wrong likelihood winner, a float-compared
    // score or a wrong marker strip flips the hash.
    QueryDef("text_wordpiece_train",
      "WITH " + sqlTrainCtes() + s"""
SELECT * FROM (${(1 to K).map(i => s"""
  SELECT CAST($i AS BIGINT) AS merge_rank, a AS lhs, b AS rhs,
    ${sqlFused("a", "b")} AS token,
    f AS pair_f, fa AS left_f, fb AS right_f FROM m$i""")
        .mkString(" UNION ALL ")})
ORDER BY merge_rank""") { (s, d) =>
      import s.implicits._
      trained(s, d).merges
        .map(m => (m.rank.toLong, m.left, m.right, m.token,
          m.pairFreq, m.leftFreq, m.rightFreq))
        .toDF("merge_rank", "lhs", "rhs", "token",
          "pair_f", "left_f", "right_f")
        .orderBy("merge_rank")
    },

    // The 100 TB encode shape end to end: trainLocal on src0, then
    // the WHOLE corpus greedy-max-matched map-only (broadcast vocab
    // set, per-partition word memo). Per document: piece count, the
    // [UNK] count (the WordPiece OOV signal — src0's alphabet does
    // not cover every corpus character) and the first five pieces.
    QueryDef("pipeline_wordpiece_encode",
      "WITH " + sqlTrainCtes() + ",\n" + sqlVocabCte() + ",\n" +
        sqlEncodeCtes() + ",\n" + sqlEncDoc + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  CAST(coalesce(len(list_filter(toks, t -> t = '[UNK]')), 0)
    AS BIGINT) AS n_unk,
  coalesce(array_to_string(toks[1:5], '|'), '') AS head_pieces
FROM documents LEFT JOIN enc USING (doc_id)
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      WordPiece.encodeScalable(docs, "doc_id", "text",
          trained(s, d).vocab, MaxWordLen)
        .select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_pieces"),
          coalesce(size(filter(col("tokens"),
            t => t === WordPiece.Unk)), lit(0)).cast("long")
            .as("n_unk"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_pieces"))
        .orderBy("doc_id")
    },

    // WORDPIECE ARTIFACT STORE round-trip — the third tokenizer
    // family's ship-it grade, mirroring text_bpe_store /
    // text_unigram_store: train on src0, PERSIST the vocab + encode
    // geometry, RELOAD (explicit schemas, version/geometry/count/
    // uniqueness validation), and encode the WHOLE corpus from the
    // reloaded artifact. vocab_checksum is recomputed from the
    // RELOADED rows (and by the oracle from its own trained vocab
    // CTE), so a store that drops, duplicates or corrupts one piece
    // flips the constant column; a reloaded set that MATCHES
    // differently flips every token column.
    QueryDef("text_wordpiece_store",
      "WITH " + sqlTrainCtes() + ",\n" + sqlVocabCte() + s""",
mc AS (
  SELECT CAST(SUM(${sqlH31("piece")}) AS BIGINT) AS vocab_checksum
  FROM vocab),
""" + sqlEncodeCtes() + ",\n" + sqlEncDoc + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  coalesce(array_to_string(toks[1:5], '|'), '') AS head_pieces,
  vocab_checksum
FROM documents LEFT JOIN enc USING (doc_id), mc
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val dir = graft.Scratch.dir("wordpiece-store", d) + "/tokenizer"
      WordPiece.saveVocab(s, dir, trained(s, d).vocab, MaxWordLen)
      val art = WordPiece.loadVocab(s, dir)
      val checksum = art.vocab.map(
        graft.ext.TextAnalysis.tokenHash31Local).sum
      WordPiece.encodeWithArtifact(docs, "doc_id", "text", art)
        .select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_pieces"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_pieces"),
          lit(checksum).as("vocab_checksum"))
        .orderBy("doc_id")
    },

    // ROUND-TRIP losslessness of the ## algebra: decode(encode(text))
    // — continuation pieces append, word-initial pieces open a new
    // word — must reproduce the whitespace-normalized original for
    // EVERY [UNK]-free document ([UNK] is lossy by construction:
    // over-budget and alphabet-miss words collapse to one token).
    // The Spark side carries an in-plan raise_error guard — an
    // [UNK]-free document that fails to reconstruct is an encoder bug
    // and fails the QUERY loudly, not just the hash; the oracle
    // recomputes the same booleans from its own token streams.
    QueryDef("text_wordpiece_roundtrip",
      "WITH " + sqlTrainCtes() + ",\n" + sqlVocabCte() + ",\n" +
        sqlEncodeCtes() + ",\n" + sqlEncDoc + s"""
SELECT doc_id,
  CAST(coalesce(len(toks), 0) AS BIGINT) AS n_pieces,
  CAST(coalesce(len(list_filter(toks, t -> t = '[UNK]')), 0)
    AS BIGINT) AS n_unk,
  CASE WHEN coalesce(len(list_filter(toks, t -> t = '[UNK]')), 0) = 0
    THEN coalesce(
      ltrim(coalesce(array_to_string(list_transform(toks,
        t -> CASE WHEN t LIKE '##%' THEN substr(t, 3)
             ELSE ' ' || t END), ''), ''))
      = array_to_string(list_filter(string_split(text, ' '),
          v -> length(v) > 0), ' '), FALSE)
    ELSE FALSE END AS lossless
FROM documents LEFT JOIN enc USING (doc_id)
ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val enc = WordPiece.encodeScalable(docs, "doc_id", "text",
        trained(s, d).vocab, MaxWordLen)
      val joined = docs.select(col("doc_id").cast("long").as("doc_id"),
          col("text"))
        .join(enc, Seq("doc_id"))
      val nUnk = coalesce(size(filter(col("tokens"),
        t => t === WordPiece.Unk)), lit(0)).cast("long")
      val norm = array_join(filter(split(col("text"), " "),
        v => length(v) > 0), " ")
      val lossInner =
        coalesce(WordPiece.decodeTokens(col("tokens")) === norm,
          lit(false))
      joined.select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_pieces"),
          nUnk.as("n_unk"),
          when(nUnk === 0L,
            when(col("text").isNotNull && !lossInner,
              raise_error(concat(
                lit("wordpiece roundtrip violated for doc "),
                col("doc_id").cast("string"))).cast("boolean"))
              .otherwise(lossInner))
            .otherwise(lit(false)).as("lossless"))
        .orderBy("doc_id")
    }
  )
}
