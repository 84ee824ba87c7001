package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._

/** BPE tokenizer-training suite: the [[graft.ext.Bpe]] learn loop and
  * map-only encoder, oracle-replayed END TO END \u2014 the DuckDB side
  * re-runs every training iteration (pair count, deterministic argmax,
  * greedy merge apply) as a generated MATERIALIZED-CTE chain and must
  * land on the identical merge table, token counts and token streams.
  * (MATERIALIZED is load-bearing: each stage is referenced twice \u2014
  * by the next stage and by the argmax \u2014 so an inlining planner would
  * otherwise expand the chain exponentially.)
  *
  * Everything is integral or exact-string, so the grade is
  * hash-strict: a wrong tie-break, a shared-delimiter merge loss, or
  * a pair counted per-word instead of per-position all flip the hash.
  */
object BpeQueries {

  /** Generated SQL replay of [[Bpe.train]]: `k` chained stages over
    * the word-frequency table of `documents` (optionally filtered).
    * Returns the WITH-clause body; stage `i` leaves CTEs `m{i}` (the
    * winning merge) and `w{i}` (the vocab after applying it).
    * `w0Override` replaces the default character-split starting vocab
    * (the CONTINUATION hook: a domain-adapt chain starts from the
    * vocabulary rewritten under an earlier merge table). */
  private[queries] def sqlTrainCtes(k: Int, srcFilter: String,
      cte: String = "", wordExpr: String =
        "unnest(string_split(text, ' '))",
      from: String = "documents",
      w0Override: Option[String] = None): String = {
    val b = Seq.newBuilder[String]
    b += s"""${cte}wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT $wordExpr AS word FROM $from$srcFilter)
  WHERE length(word) > 0 GROUP BY 1)"""
    b += s"""${cte}w0 AS MATERIALIZED (
  ${w0Override.getOrElse(
        s"SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS w," +
          s" freq FROM ${cte}wf")})"""
    for (i <- 1 to k) {
      b += s"""${cte}p$i AS MATERIALIZED (
  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS f FROM (
    SELECT unnest(list_transform(range(1, len(l)),
        j -> struct_pack(a := l[j], b := l[j+1]))) AS p, freq
    FROM (SELECT string_split(trim(w), '  ') AS l, freq FROM ${cte}w${i - 1}))
  GROUP BY 1, 2)"""
      b += s"${cte}m$i AS MATERIALIZED (" +
        s"SELECT a, b, f FROM ${cte}p$i ORDER BY f DESC, a, b LIMIT 1)"
      b += s"""${cte}w$i AS MATERIALIZED (
  SELECT replace(w, ' ' || m.a || '  ' || m.b || ' ',
                 ' ' || m.a || m.b || ' ') AS w, freq
  FROM ${cte}w${i - 1}, ${cte}m$i m)"""
    }
    b.result().mkString(",\n")
  }

  /** Nested-replace encode chain of one word expression under an
    * ordered list of one-row merge CTEs (cross-joined) — rank order
    * IS list order, so a continuation chain is just base tables
    * followed by the adapt tables. */
  private[queries] def sqlEncodeChainTables(tables: Seq[String],
      inner: String = "regexp_replace(w, '(.)', ' \\1 ', 'g')")
      : String =
    tables.foldLeft(inner) { (acc, t) =>
      s"replace($acc, ' ' || $t.a || '  ' || $t.b || ' '," +
        s" ' ' || $t.a || $t.b || ' ')"
    }

  /** Nested-replace encode chain of one word `w` under the oracle's
    * learned merges `m1..mk` (cross-joined one-row CTEs). */
  private[queries] def sqlEncodeChain(k: Int): String =
    sqlEncodeChainTables((1 to k).map("m" + _))

  /** Merges used by the graded queries \u2014 small enough that the
    * unrolled oracle stays readable, large enough that multi-char
    * symbols feed later merges (rank 12 fuses "jo"+"in"). */
  private[queries] val K = 12

  private def sqlH31(t: String): String = OracleSql.h31(t)

  /** GPT-2's byte-to-unicode table as a DuckDB mapping CTE: printable
    * latin-1 bytes map to themselves, the 68 others shift to 256+n in
    * byte order (the inclusive running count supplies n+1, hence
    * 255+). `bl` collects the 256 mapped CHARS as one list so the
    * per-word lambda can index it. */
  private[queries] val sqlByteMapCtes: String =
    """bmap AS MATERIALIZED (
      |  SELECT b, CASE WHEN pr THEN b
      |    ELSE 255 + SUM(CASE WHEN pr THEN 0 ELSE 1 END)
      |      OVER (ORDER BY b) END AS m
      |  FROM (SELECT range AS b,
      |      (range BETWEEN 33 AND 126) OR (range BETWEEN 161 AND 172)
      |        OR (range BETWEEN 174 AND 255) AS pr
      |    FROM range(256))),
      |bl AS MATERIALIZED (
      |  SELECT list(chr(m::INT) ORDER BY b) AS l FROM bmap)"""
      .stripMargin

  /** Byte-level map of one string expression `s` under the `bl` list:
    * UTF-8 bytes via `hex(encode(..))` split into 2-char chunks, each
    * indexed into the 256-entry mapped-char list (1-based: byte+1). */
  private[queries] def sqlByteMap(s: String): String =
    "array_to_string(list_transform(" +
      s"regexp_extract_all(hex(encode($s)), '..')," +
      " h -> l[(strpos('0123456789ABCDEF', h[1:1]) - 1) * 16" +
      " + strpos('0123456789ABCDEF', h[2:2])]), '')"

  /** Byte-level pretokens: the [[sqlPretok]] regex scan, each pretoken
    * byte-mapped (subsumes the U+0120 marker \u2014 0x20's entry IS 288). */
  private[queries] val sqlPretokBytes: String =
    "unnest(list_transform(regexp_extract_all(text," +
      " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
      s" t -> ${sqlByteMap("t")}))"

  /** The GPT-2-family pretokenizer as DuckDB SQL: same RE2-safe
    * pattern as [[graft.ext.Bpe.PretokPattern]] (the `'` doubled for
    * the SQL literal), then the byte-level space marker U+0120
    * (`chr(288)`) replacing every in-token space \u2014 so the oracle's
    * pretokens are delimiter-free exactly like the Spark side's. */
  private val sqlPretok: String =
    "unnest(list_transform(regexp_extract_all(text," +
      " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
      " t -> replace(t, ' ', chr(288))))"

  /** Corpus-derived PRODUCTION-SIZE train surface: the fixture's
    * 31-word vocabulary cannot feed thousands of merges, so every
    * token gets a per-doc-bucket md5 suffix (default 96 buckets) \u2014
    * ~3k distinct word types whose hex tails supply the dense pair
    * diversity of a Heaps-shaped vocabulary (~11k merges learnable to
    * exhaustion \u2014 measured, comfortably past the 8192 the timed
    * datapoint trains; 64 buckets exhausts at ~8.1k, and more buckets
    * only raise trainLocal's argmax cost, merges x live pairs, which
    * the bench pays 4x per round). The merge-forest exhaustion bound
    * scales ~linearly in `buckets`: the 32k-merge scale probe
    * (`ScaleCurve` / `DevBpeK`) passes 384.
    * Deterministic (md5 of token and bucket), map-only derivation.
    * Returns the `(word, freq)` table and the salted corpus re-joined
    * as text, so the encode legs run over exactly the surface the
    * merges were learned on. */
  def saltedCorpus(s: org.apache.spark.sql.SparkSession, d: String,
      buckets: Int = 96)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val salted = Tables.documents(s, d).select(col("doc_id"),
      transform(
        filter(TextAnalysis.tokens(col("text")), t => length(t) > 0),
        t => concat(t, lit("_"), substring(
          md5(concat(t, lit(":"),
            (col("doc_id") % buckets).cast("string"))), 1, 8))).as("ws"))
    val words = salted.select(explode(col("ws")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val docs2 = salted.select(col("doc_id"),
      concat_ws(" ", col("ws")).as("text"))
    (words, docs2)
  }

  /** The full data-freeze replay — gates, keeper resolution, the
    * sentence/span chain, the 12-stage train chain, the encode chain,
    * the prefix-sum window, shard keys and every manifest column.
    * Shared VERBATIM by `pipeline_data_freeze` (the all-batch
    * flagship) and `pipeline_freeze_export` (the streaming-store
    * export): the two queries are differential BY CONSTRUCTION — same
    * oracle, two independent execution paths (one batch plan vs
    * incremental freezeBatch stores + a store-only export), so a
    * divergence in either fails exactly one of them. */
  private def sqlDataFreeze: String = {
    val spanExpr = "array_to_string(l[i:i+2], chr(1))"
    val shardH = sqlH31("CAST(doc_id AS VARCHAR) || '#freeze-1'")
    s"""WITH d0 AS (
       |  SELECT doc_id, source, text || CASE WHEN doc_id % 13 = 0
       |    THEN ' ' || chr(65533) ELSE '' END AS text
       |  FROM documents),
       |s1 AS (SELECT * FROM d0 WHERE strpos(text, chr(65533)) = 0),
       |s2 AS MATERIALIZED (
       |  SELECT * FROM s1
       |  WHERE len(list_filter(string_split(text, ' '),
       |      t -> t IN ('slow', 'big'))) * 1000
       |    <= 100 * len(string_split(text, ' '))),
       |s3 AS MATERIALIZED (
       |  SELECT * FROM s2
       |  WHERE doc_id IN (SELECT min(doc_id) FROM s2 GROUP BY text)),
       |planted AS (
       |  SELECT doc_id, source, array_to_string(list_transform(
       |    string_split(text, ' '),
       |    t -> t || CASE WHEN ${sqlH31("t")} % 5 = 0
       |              THEN '.' ELSE '' END), ' ') AS p
       |  FROM s3),
       |ss AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    string_split(
       |      regexp_replace(p,
       |        '([.!?]+["'')\\]]*)[ \\t\\r\\n\\f]+', '\\1' || chr(1), 'g'),
       |      chr(1)),
       |    s -> trim(s)), s -> length(s) > 0) AS l
       |  FROM planted),
       |sent AS (
       |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS idx, l[i] AS s
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
       |        FROM ss)),
       |spans AS (
       |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS idx,
       |    ${sqlH31(spanExpr)} AS h1,
       |    ${sqlH31(s"$spanExpr || '#'")} AS h2
       |  FROM (SELECT doc_id, l, unnest(range(1, len(l) - 1)) AS i
       |        FROM ss)),
       |occ AS (
       |  SELECT doc_id, idx,
       |    COUNT(*) OVER (PARTITION BY h1, h2) AS occ,
       |    ROW_NUMBER() OVER (PARTITION BY h1, h2
       |      ORDER BY doc_id, idx) AS rn
       |  FROM spans),
       |drops AS (
       |  SELECT DISTINCT o.doc_id, o.idx + dd.d AS idx
       |  FROM occ o, (SELECT unnest(range(0, 3)) AS d) dd
       |  WHERE o.occ > 1 AND o.rn > 1),
       |kept AS (
       |  SELECT s.doc_id, s.idx, s.s FROM sent s
       |  LEFT JOIN drops d ON d.doc_id = s.doc_id AND d.idx = s.idx
       |  WHERE d.doc_id IS NULL),
       |ka AS (
       |  SELECT doc_id,
       |    array_to_string(list(s ORDER BY idx), ' ') AS kt
       |  FROM kept GROUP BY doc_id),
       |frozen AS MATERIALIZED (
       |  SELECT s3.doc_id, s3.source, ka.kt AS text
       |  FROM s3 JOIN ka USING (doc_id)),
       |""".stripMargin +
      sqlTrainCtes(K, " WHERE source = 'src0'", from = "frozen") +
      s""",
       |enc AS (
       |  SELECT doc_id,
       |    flatten(list_transform(
       |      list_filter(string_split(text, ' '), v -> length(v) > 0),
       |      w -> string_split(trim(${sqlEncodeChain(K)}), '  ')))
       |      AS toks
       |  FROM frozen, ${(1 to K).map("m" + _).mkString(", ")}),
       |tc AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM enc),
       |rr AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - n_tokens AS BIGINT) AS start_offset
       |  FROM tc),
       |pk AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(FLOOR(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT)
       |      AS bin
       |  FROM rr),
       |sh AS (
       |  SELECT p.doc_id, p.n_tokens, p.bin, f.text,
       |    $shardH % 8 AS shard_id,
       |    $shardH * 10000000 + p.doc_id % 10000000 AS k
       |  FROM pk p JOIN frozen f USING (doc_id))
       |SELECT shard_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(bin) AS BIGINT) AS bin_checksum,
       |  CAST(SUM(${sqlH31("CAST(doc_id AS VARCHAR) || '|' || text")})
       |    AS BIGINT) AS checksum,
       |  arg_min(doc_id, k) AS first_doc,
       |  arg_max(doc_id, k) AS last_doc
       |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** In-plan guard for the rows-only 8k-merge datapoint: BPE merging
    * only ever FUSES symbols, so token totals must be strictly
    * monotone in merge count — `n_tokens_kbig < n_tokens_k12 <
    * n_chars` (the zero-merge symbol count). A rows-only grade can't
    * catch a silently-regressed trainer, so the invariant raises in
    * the plan itself: the violated branch `raise_error`s with all
    * three totals. (Strictness is safe on the salted fixture: 8192 >
    * 12 > 0 merges each strictly compress it.) */
  private[graft] def compressionGuard(
      df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ok = col("n_tokens_kbig") < col("n_tokens_k12") &&
      col("n_tokens_k12") < col("n_chars")
    df.select(
      when(ok, col("merges_learned")).otherwise(raise_error(concat(
        lit("pipeline_bpe_vocab8k: monotone-compression invariant " +
          "violated (expected n_tokens_kbig < n_tokens_k12 < " +
          "n_chars, got "),
        col("n_tokens_kbig").cast("string"), lit(" / "),
        col("n_tokens_k12").cast("string"), lit(" / "),
        col("n_chars").cast("string"), lit(")"))))
        .as("merges_learned"),
      col("vocab_rows"), col("n_chars"), col("n_tokens_k12"),
      col("n_tokens_kbig"))
  }

  val defs: Seq[QueryDef] = Seq(

    // The learn loop itself, graded merge by merge: rank, the fused
    // pair, and the winning weighted pair count. Ties break on the
    // lexicographically smallest (lhs, rhs) \u2014 binary collation in
    // both engines \u2014 so the table is deterministic to the byte.
    QueryDef("text_bpe_train",
      "WITH " + sqlTrainCtes(K, "") + "\nSELECT * FROM (\n" +
        (1 to K).map(i =>
          s"  SELECT $i AS merge_rank, a AS lhs, b AS rhs, f AS freq" +
            s" FROM m$i").mkString(" UNION ALL\n") +
        "\n) ORDER BY merge_rank") { (s, d) =>
      val merges = Bpe.train(
        Bpe.wordFreq(Tables.documents(s, d), "text"), K)
      Bpe.mergeTable(s, merges).orderBy("merge_rank")
    },

    // End-to-end tokenizer flagship: train on the src0 slice (the
    // "tokenizer corpus"), then encode the WHOLE corpus map-only with
    // the merge table riding the plan as literals. Per document:
    // word count, subword token count, integral fertility
    // (tokens-per-1000-words \u2014 THE tokenizer-quality metric), and the
    // first five tokens of the stream as a direct token-level grade.
    QueryDef("pipeline_bpe_tokenize",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
enc AS (
  SELECT doc_id,
    list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> string_split(trim(${sqlEncodeChain(K)}), '  ')) AS tw
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")})
SELECT doc_id,
  CAST(len(tw) AS BIGINT) AS n_words,
  CAST(coalesce(list_sum(list_transform(tw, t -> len(t))), 0)
    AS BIGINT) AS n_tokens,
  CASE WHEN len(tw) = 0 THEN 0 ELSE
    CAST(coalesce(list_sum(list_transform(tw, t -> len(t))), 0) * 1000
      AS BIGINT) // len(tw) END AS fertility_permil,
  array_to_string(flatten(tw)[1:5], '|') AS head_tokens
FROM enc ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      val wds = filter(TextAnalysis.tokens(col("text")),
        w => length(w) > 0)
      val toks = flatten(transform(wds, w => Bpe.encodeWord(w, merges)))
      docs
        .select(col("doc_id"),
          size(wds).cast("long").as("n_words"),
          size(toks).cast("long").as("n_tokens"),
          slice(toks, 1, 5).as("head"))
        .select(col("doc_id"), col("n_words"), col("n_tokens"),
          when(col("n_words") === 0L, 0L)
            .otherwise(expr("(n_tokens * CAST(1000 AS BIGINT))" +
              " div n_words")).as("fertility_permil"),
          concat_ws("|", col("head")).as("head_tokens"))
        .orderBy("doc_id")
    },

    // Corpus vocabulary audit under the learned tokenizer: encode the
    // whole corpus with the src0-trained merges, then the top-25
    // subword types by corpus frequency (freq desc, token asc \u2014 a
    // total order). Grades the full train -> encode -> corpus-count
    // composition: whole-word tokens ("join") must emerge above raw
    // characters exactly as the merge table dictates. The count is the
    // canonical post-encode word-count shuffle (token-keyed, map-side
    // combined) \u2014 the one corpus-scale aggregation a tokenizer audit
    // costs at 100 TB.
    QueryDef("text_bpe_vocab",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
enc AS (
  SELECT doc_id,
    flatten(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")})
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
FROM (SELECT unnest(toks) AS token FROM enc)
GROUP BY token ORDER BY freq DESC, token LIMIT 25""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      Bpe.encode(docs, "doc_id", "text", merges)
        .select(explode(col("tokens")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(25)
    },

    // Training-batch assembly under the REAL tokenizer: context
    // windows fill by SUBWORD counts, not whitespace words \u2014 the
    // number that actually bounds a training sequence. Encode is the
    // map-only literal-merge pass; the only additional corpus work is
    // the distributed prefix sum (range-partitioned, never a
    // single-reducer window). Rows longer than the budget still get
    // their own bin(s) \u2014 the packIntoBins contract.
    QueryDef("pipeline_bpe_packing",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
tc AS (
  SELECT doc_id,
    CAST(coalesce(list_sum(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> len(string_split(trim(${sqlEncodeChain(K)}), '  ')))), 0)
      AS BIGINT) AS n_tokens
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")}),
rr AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS BIGINT) AS start_offset
  FROM tc)
SELECT doc_id, n_tokens, start_offset,
  CAST(FLOOR(CAST(start_offset AS DOUBLE) / 2048) AS BIGINT) AS bin
FROM rr ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      val counts = Bpe.encode(docs, "doc_id", "text", merges)
        // coalesce matches the oracle's coalesce(..., 0): size(null)
        // is -1 under spark.sql.legacy.sizeOfNull=true, which would
        // silently shift every downstream prefix-sum offset
        .select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_tokens"))
      graft.ops.PrefixSum.packIntoBins(counts,
          weight = col("n_tokens"), budget = 2048L,
          orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          col("bin").cast("bigint").as("bin"))
        .orderBy("doc_id")
    },

    // CONCAT-AND-CHUNK training sequences \u2014 the OTHER production
    // packing next to whole-doc bin packing (pipeline_bpe_packing):
    // the GPT norm concatenates the token stream and splits at EXACTLY
    // `ctx` tokens, so documents SPAN chunk boundaries and every
    // training sequence is full. Graded per CHUNK: how many documents
    // touch it, its first/last document, and the token fill \u2014 the
    // fill must be exactly `ctx` for every chunk but the last (the
    // overlap arithmetic min(end, (c+1)\u00b7ctx) \u2212 max(start, c\u00b7ctx),
    // summed per chunk, is replayed in SQL, so one off-by-one at any
    // boundary flips the hash). Corpus cost: the encode map pass, the
    // prefix-sum range partition, one bounded explode (total_tokens /
    // ctx + n_docs rows) and the chunk-keyed agg.
    QueryDef("pipeline_bpe_chunks",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
tc AS (
  SELECT doc_id,
    CAST(coalesce(list_sum(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> len(string_split(trim(${sqlEncodeChain(K)}), '  ')))), 0)
      AS BIGINT) AS n_tokens
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")}),
rr AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS BIGINT) AS s,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS e
  FROM tc),
ch AS (
  SELECT doc_id, s, e, CAST(c AS BIGINT) AS chunk_id
  FROM (SELECT doc_id, s, e, unnest(range(s // 2048, (e - 1) // 2048
      + 1)) AS c
    FROM rr WHERE n_tokens > 0))
SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
  CAST(SUM(least(e, (chunk_id + 1) * 2048)
    - greatest(s, chunk_id * 2048)) AS BIGINT) AS fill
FROM ch GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      val counts = Bpe.encodeScalable(docs, "doc_id", "text", merges)
        // coalesce matches the oracle's coalesce(..., 0): size(null)
        // is -1 under spark.sql.legacy.sizeOfNull=true, which would
        // silently shift every downstream prefix-sum offset
        .select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_tokens"))
      val ctx = 2048L
      graft.ops.PrefixSum.packIntoBins(counts,
          weight = col("n_tokens"), budget = ctx,
          orderBy = Seq(col("doc_id")))
        .filter(col("n_tokens") > 0L)
        .select(col("doc_id"), col("start_offset").as("s"),
          (col("start_offset") + col("n_tokens")).as("e"))
        .select(col("doc_id"), col("s"), col("e"),
          // integer division: `/` on longs is Spark's true division
          explode(sequence(expr(s"s div $ctx"),
            expr(s"(e - 1) div $ctx"))).as("chunk_id"))
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
          sum(least(col("e"), (col("chunk_id") + 1L) * ctx) -
            greatest(col("s"), col("chunk_id") * ctx))
            .cast("long").as("fill"))
        .orderBy("chunk_id")
    },

    // PACKED-WINDOW LAYOUT MANIFEST — the per-piece refinement of
    // pipeline_bpe_chunks, at the granularity a dataloader actually
    // consumes: one row per (window, document piece) with the
    // window-local offset, piece length, the piece's position inside
    // its document and a dense per-window segment id. The segment id
    // is what masks CROSS-DOCUMENT attention in packed training (two
    // pieces in one window must not attend to each other), and
    // doc_tok_start is what stitches a document back together across
    // windows. Same overlap arithmetic as the chunk grade, so one
    // off-by-one at any boundary flips the hash; the seg_id window
    // runs per chunk_id — a BOUNDED group (a window holds at most ctx
    // one-token pieces), so the partition-by-window row_number is
    // scale-safe where a corpus-wide one would not be.
    QueryDef("pipeline_packing_layout",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
tc AS (
  SELECT doc_id,
    CAST(coalesce(list_sum(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> len(string_split(trim(${sqlEncodeChain(K)}), '  ')))), 0)
      AS BIGINT) AS n_tokens
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")}),
rr AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS BIGINT) AS s,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS e
  FROM tc),
pc AS (
  SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
    greatest(s, c * 2048) - c * 2048 AS local_start,
    least(e, (c + 1) * 2048) - greatest(s, c * 2048) AS piece_len,
    greatest(s, c * 2048) - s AS doc_tok_start
  FROM (SELECT doc_id, s, e, unnest(range(s // 2048, (e - 1) // 2048
      + 1)) AS c
    FROM rr WHERE n_tokens > 0))
SELECT chunk_id,
  CAST(row_number() OVER (PARTITION BY chunk_id ORDER BY local_start)
    AS BIGINT) AS seg_id,
  doc_id, CAST(local_start AS BIGINT) AS local_start,
  CAST(piece_len AS BIGINT) AS piece_len,
  CAST(doc_tok_start AS BIGINT) AS doc_tok_start
FROM pc ORDER BY chunk_id, seg_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      val counts = Bpe.encodeScalable(docs, "doc_id", "text", merges)
        // coalesce matches the oracle's coalesce(..., 0): size(null)
        // is -1 under spark.sql.legacy.sizeOfNull=true, which would
        // silently shift every downstream prefix-sum offset
        .select(col("doc_id"),
          coalesce(size(col("tokens")), lit(0)).cast("long")
            .as("n_tokens"))
      val ctx = 2048L
      val pieces = graft.ops.PrefixSum.packIntoBins(counts,
          weight = col("n_tokens"), budget = ctx,
          orderBy = Seq(col("doc_id")))
        .filter(col("n_tokens") > 0L)
        .select(col("doc_id"), col("start_offset").as("s"),
          (col("start_offset") + col("n_tokens")).as("e"))
        .select(col("doc_id"), col("s"), col("e"),
          explode(sequence(expr(s"s div $ctx"),
            expr(s"(e - 1) div $ctx"))).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          (greatest(col("s"), col("chunk_id") * ctx) -
            col("chunk_id") * ctx).as("local_start"),
          (least(col("e"), (col("chunk_id") + 1L) * ctx) -
            greatest(col("s"), col("chunk_id") * ctx)).as("piece_len"),
          (greatest(col("s"), col("chunk_id") * ctx) - col("s"))
            .as("doc_tok_start"))
      import org.apache.spark.sql.expressions.Window
      pieces
        .withColumn("seg_id", row_number().over(
          Window.partitionBy(col("chunk_id"))
            .orderBy(col("local_start"))).cast("long"))
        .select(col("chunk_id"), col("seg_id"), col("doc_id"),
          col("local_start").cast("long"),
          col("piece_len").cast("long"),
          col("doc_tok_start").cast("long"))
        .orderBy("chunk_id", "seg_id")
    },

    // Tokenizer DRIFT audit \u2014 the governance question after a corpus
    // shift: train the same-geometry tokenizer on two slices (src0 vs
    // src1) and compare merge tables rank by rank. Divergence rank
    // tells you when the learned vocabularies part ways; at 100 TB
    // both trains still cost one word-count each plus vocab-table
    // iterations. Oracle runs BOTH 12-stage chains (prefixed CTE
    // namespaces) and replays the comparison.
    QueryDef("text_bpe_drift",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'", "x") + ",\n" +
        sqlTrainCtes(K, " WHERE source = 'src1'", "y") +
        ",\nm AS (\n" +
        (1 to K).map(i =>
          s"  SELECT $i AS merge_rank, xm$i.a AS lhs_a, xm$i.b AS" +
            s" rhs_a, ym$i.a AS lhs_b, ym$i.b AS rhs_b" +
            s" FROM xm$i, ym$i").mkString(" UNION ALL\n") + ")\n" +
        """SELECT merge_rank, lhs_a, rhs_a, lhs_b, rhs_b,
          |  lhs_a = lhs_b AND rhs_a = rhs_b AS agree
          |FROM m ORDER BY merge_rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // the two source-slice trains share nothing — submit their
      // (inherently sequential, one-job-per-merge) loops concurrently
      // so the cluster interleaves their tiny argmax stages instead of
      // idling between one loop's driver round-trips (the
      // dedup_suffix_cross_shard per-shard placement, applied here)
      val (a, b) = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val fa = Future(Bpe.train(
          Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K))
        val fb = Future(Bpe.train(
          Bpe.wordFreq(docs.filter(col("source") === "src1"), "text"), K))
        (Await.result(fa, scala.concurrent.duration.Duration.Inf),
          Await.result(fb, scala.concurrent.duration.Duration.Inf))
      }
      Bpe.mergeTable(s, a)
        .select(col("merge_rank"), col("lhs").as("lhs_a"),
          col("rhs").as("rhs_a"))
        .join(Bpe.mergeTable(s, b)
          .select(col("merge_rank"), col("lhs").as("lhs_b"),
            col("rhs").as("rhs_b")), Seq("merge_rank"))
        .withColumn("agree",
          col("lhs_a") === col("lhs_b") && col("rhs_a") === col("rhs_b"))
        .orderBy("merge_rank")
    },

    // PRODUCTION pre-tokenization ahead of BPE: GPT-2-family regex
    // pretokens (contractions, optionally space-prefixed letter/digit
    // runs, punctuation runs) with the byte-level U+0120 space marker,
    // trained with the DRIVER-LOCAL classic merge loop (the
    // production-vocab trainer \u2014 one corpus word-count shuffle, then
    // in-memory iterations over the Heaps-bounded vocab). The oracle
    // replays the identical 12-stage chain over the same pretokens, so
    // this entry grades BOTH the pretokenizer's cross-engine regex
    // fidelity AND trainLocal's merge-for-merge equality with the
    // distributed reference loop.
    QueryDef("text_bpe_pretok",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'",
        wordExpr = sqlPretok) + "\nSELECT * FROM (\n" +
        (1 to K).map(i =>
          s"  SELECT $i AS merge_rank, a AS lhs, b AS rhs, f AS freq" +
            s" FROM m$i").mkString(" UNION ALL\n") +
        "\n) ORDER BY merge_rank") { (s, d) =>
      val merges = Bpe.trainLocal(
        Bpe.wordFreqPretok(
          Tables.documents(s, d).filter(col("source") === "src0"),
          "text"), K)
      Bpe.mergeTable(s, merges).orderBy("merge_rank")
    },

    // The 100 TB encode shape end to end: trainLocal (driver-local
    // classic loop) + encodeScalable (one map-only mapPartitions pass,
    // merge table riding a broadcast pair->rank index \u2014 plan size
    // independent of vocab). Semantics are rank-order greedy, so the
    // SQL oracle is the SAME literal-replace chain the reference
    // encoder uses: a divergence in either scale-path component flips
    // the hash. Per document: subword count and the first five tokens.
    QueryDef("pipeline_bpe_scaled",
      "WITH " + sqlTrainCtes(K, " WHERE source = 'src0'") + s""",
enc AS (
  SELECT doc_id,
    flatten(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, ${(1 to K).map("m" + _).mkString(", ")})
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  array_to_string(toks[1:5], '|') AS head_tokens
FROM enc ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), K)
      Bpe.encodeScalable(docs, "doc_id", "text", merges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_tokens"))
        .orderBy("doc_id")
    },

    // BYTE-LEVEL alphabet (GPT-2/Llama parity): train over byte-level
    // pretokens \u2014 every initial symbol is ONE mapped UTF-8 byte
    // through GPT-2's fixed 256-entry bijection, so the base alphabet
    // is bounded and the merge table is interchangeable with
    // production byte-level tokenizers. The oracle replays the
    // MAPPING ITSELF as a 256-row CTE (running-count construction of
    // the shifted region, hex-chunk byte extraction, list indexing)
    // ahead of the same 12-stage train chain \u2014 a wrong table entry,
    // a wrong byte split, or a code-point-level symbol anywhere flips
    // the merge sequence and the hash.
    QueryDef("text_bpe_bytelevel",
      "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + "\nSELECT * FROM (\n" +
        (1 to K).map(i =>
          s"  SELECT $i AS merge_rank, a AS lhs, b AS rhs, f AS freq" +
            s" FROM m$i").mkString(" UNION ALL\n") +
        "\n) ORDER BY merge_rank") { (s, d) =>
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(
          Tables.documents(s, d).filter(col("source") === "src0"),
          "text"), K)
      Bpe.mergeTable(s, merges).orderBy("merge_rank")
    },

    // Byte-level LOSSLESSNESS, graded per document: n_bytes is the
    // cross-engine content check (one mapped char per UTF-8 byte, so
    // Spark's length(byteLevel(text)) must equal DuckDB's
    // octet_length(encode(text)) \u2014 any mapping that drops, doubles or
    // decodes a byte breaks the equality), head_mapped replays the
    // mapped PREFIX through the mapping CTE character for character,
    // and roundtrip_ok is computed FOR REAL on the Spark side
    // (byteLevelInvert(byteLevel(text)) = text) against the oracle's
    // literal TRUE \u2014 the lossless contract stated as data: any
    // non-invertible byte flips the row to false and the hash with it.
    QueryDef("text_bpe_byte_roundtrip",
      "WITH " + sqlByteMapCtes + s""",
mt AS (
  SELECT doc_id, text, ${sqlByteMap("text")} AS mapped
  FROM documents, bl)
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  substr(mapped, 1, 24) AS head_mapped,
  TRUE AS roundtrip_ok
FROM mt ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          Bpe.byteLevel(col("text")).as("mapped"))
        .select(col("doc_id"),
          length(col("mapped")).cast("long").as("n_bytes"),
          substring(col("mapped"), 1, 24).as("head_mapped"),
          (Bpe.byteLevelInvert(col("mapped")) === col("text"))
            .as("roundtrip_ok"))
        .orderBy("doc_id")
    },

    // Byte-level corpus ENCODE, end to end: train on src0's byte-level
    // pretokens with trainLocal, encode the WHOLE corpus with
    // encodeBytesScalable (map-only: java-regex pretok + byteMapLocal
    // + the broadcast pair index + the word cache). The oracle
    // replays the mapping CTE, the pretok split, the byte map AND the
    // full literal encode chain per pretoken — so this grades the
    // byte-level twins of everything pipeline_bpe_scaled grades for
    // the code-point path: one divergent pretoken, byte, merge or
    // token order flips the hash. Per document: subword count and the
    // first five tokens (U+0120-marked, multi-byte chars as their
    // mapped byte chars).
    QueryDef("pipeline_bpe_byte_tokenize", {
      val words = "list_filter(list_transform(regexp_extract_all(text," +
        " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
        " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
        s" t -> ${sqlByteMap("t")}), v -> length(v) > 0)"
      "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + s""",
enc AS (
  SELECT doc_id,
    flatten(list_transform($words,
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, bl, ${(1 to K).map("m" + _).mkString(", ")})
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  array_to_string(toks[1:5], '|') AS head_tokens
FROM enc ORDER BY doc_id"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      Bpe.encodeBytesScalable(docs, "doc_id", "text", merges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_tokens"))
        .orderBy("doc_id")
    },

    // TOKENIZER ARTIFACT STORE round-trip — the artifact a training
    // freeze ships, graded like every other index store: train
    // byte-level on src0, PERSIST the merge table + surface metadata
    // to a parquet store, RELOAD it (explicit schemas, version/count/
    // rank-contiguity validation), and encode the WHOLE corpus from
    // the reloaded table. merge_checksum is computed from the
    // RELOADED rows (rank:lhs:rhs under the 31-bit hash, summed) and
    // the oracle recomputes it from its own trained m1..m12 CTEs — so
    // a store that drops, reorders, or corrupts one merge flips the
    // constant column even if the encode happens to agree; a reloaded
    // table that ENCODES differently flips every token column.
    QueryDef("text_bpe_store", {
      val words = "list_filter(list_transform(regexp_extract_all(text," +
        " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
        " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
        s" t -> ${sqlByteMap("t")}), v -> length(v) > 0)"
      val checksum = (1 to K).map(i =>
        sqlH31(s"CAST($i AS VARCHAR) || ':' || m$i.a || ':' || m$i.b"))
        .mkString(" + ")
      "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + s""",
mc AS (
  SELECT CAST($checksum AS BIGINT) AS merge_checksum
  FROM ${(1 to K).map("m" + _).mkString(", ")}),
enc AS (
  SELECT doc_id,
    flatten(list_transform($words,
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, bl, ${(1 to K).map("m" + _).mkString(", ")})
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  array_to_string(toks[1:5], '|') AS head_tokens, merge_checksum
FROM enc, mc ORDER BY doc_id"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val trained = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      // persist -> reload: the reloaded artifact drives EVERYTHING
      // below; the in-memory `trained` is never used again
      val dir = graft.Scratch.dir("bpe-store", d) + "/tokenizer"
      Bpe.saveTokenizer(s, dir, trained, byteLevel = true)
      val art = Bpe.loadTokenizer(s, dir)
      val checksum = art.merges.map(m => TextAnalysis.tokenHash31Local(
        s"${m.rank}:${m.left}:${m.right}")).sum
      Bpe.encodeWithArtifact(docs, "doc_id", "text", art)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_tokens"),
          lit(checksum).as("merge_checksum"))
        .orderBy("doc_id")
    },

    // TOKEN-ID ASSIGNMENT — the last step before a trainer: shards
    // ship INTEGER id streams, not token strings. Ids are assigned
    // the GPT-2 way, corpus-independent: the 256 byte-alphabet chars
    // take their byte value (the ByteToUnicode table order), merge
    // PRODUCTS take 256 + rank - 1, and a product string minted by
    // two different ranks resolves to the FIRST rank (products are
    // >= 2 chars, so they never collide with the alphabet). The map
    // rides the plan as a literal map expression (268 entries —
    // codegen'd element_at, no join, no UDF), so the whole encode +
    // id-ing stays one map pass. Graded per document: token count,
    // the integer id sum, and the first five ids — the oracle
    // rebuilds the vocabulary from its own mapping + train CTEs and
    // re-derives every id, so one wrong table position, rank offset
    // or collision resolution flips the hash.
    QueryDef("pipeline_token_ids", {
      val words = "list_filter(list_transform(regexp_extract_all(text," +
        " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
        " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
        s" t -> ${sqlByteMap("t")}), v -> length(v) > 0)"
      "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + s""",
vocab AS MATERIALIZED (
  SELECT l[i + 1] AS token, CAST(i AS BIGINT) AS id
  FROM bl, (SELECT unnest(range(0, 256)) AS i)
  UNION ALL
  SELECT token, id FROM (
    SELECT token, 255 + mr AS id,
      ROW_NUMBER() OVER (PARTITION BY token ORDER BY mr) AS rn
    FROM (${(1 to K).map(i =>
        s"SELECT $i AS mr, a || b AS token FROM m$i")
        .mkString(" UNION ALL ")}))
  WHERE rn = 1),
enc AS (
  SELECT doc_id,
    flatten(list_transform($words,
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, bl, ${(1 to K).map("m" + _).mkString(", ")}),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, toks[i] AS t
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
    FROM enc)),
tid AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(v.id) AS BIGINT) AS id_sum,
    array_to_string((list(v.id ORDER BY k.i))[1:5], '|') AS head_ids
  FROM tok k JOIN vocab v ON v.token = k.t
  GROUP BY 1)
SELECT doc_id,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum,
  coalesce(head_ids, '') AS head_ids
FROM documents LEFT JOIN tid USING (doc_id)
ORDER BY doc_id"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      // the vocabulary rides a BROADCAST hash map folded inside the
      // encode's own map pass — NOT a literal-map element_at chain:
      // Spark's map literals are array-backed, so element_at is a
      // LINEAR key scan per lookup (~270 string compares x millions
      // of tokens x duplicated expression copies measured ~9x slower
      // here). Map lookup throws on an out-of-vocabulary token —
      // impossible by construction (byte alphabet + products), and
      // anything else must fail loudly, not null out of the id stream.
      val bc = s.sparkContext.broadcast(Bpe.idVocab(merges))
      import s.implicits._
      Bpe.encodeBytesScalable(docs, "doc_id", "text", merges)
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val v = bc.value
          it.map { case (id, toks) =>
            if (toks == null) (id, 0L, 0L, "")
            else {
              var sum = 0L
              toks.foreach(t => sum += v(t))
              (id, toks.size.toLong, sum,
                toks.take(5).map(v).mkString("|"))
            }
          }
        }
        .toDF("doc_id", "n_tokens", "id_sum", "head_ids")
        .orderBy("doc_id")
    },

    // ID -> TEXT DECODE ROUND-TRIP — proves the integer shards are
    // SELF-CONTAINED: the decode path sees ONLY the id stream (the
    // token strings are forgotten after id assignment), inverts each
    // id through idVocabInverse (first-rank collision rule respected
    // by construction: a product string minted by two ranks took the
    // FIRST rank's id, so the id space is injective — checked, not
    // assumed), concatenates the byte-level surface and inverts the
    // GPT-2 byte map back to UTF-8 text, graded per document against
    // documents.text itself. The oracle rebuilds the inverse
    // vocabulary from its own train CTEs, precomputes each vocab
    // entry's byte-hex ONCE (268 entries — not per occurrence), and
    // re-decodes via from_hex, so a wrong id, a swapped inverse
    // entry, or a byte-table off-by-one flips round_trip_ok or the
    // decoded head. Corpus cost: the encode map pass, one id-keyed
    // map-side lookup, and the doc-keyed compare join.
    QueryDef("pipeline_token_decode", {
      val words = "list_filter(list_transform(regexp_extract_all(text," +
        " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
        " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
        s" t -> ${sqlByteMap("t")}), v -> length(v) > 0)"
      "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + s""",
vocab AS MATERIALIZED (
  SELECT l[i + 1] AS token, CAST(i AS BIGINT) AS id
  FROM bl, (SELECT unnest(range(0, 256)) AS i)
  UNION ALL
  SELECT token, id FROM (
    SELECT token, 255 + mr AS id,
      ROW_NUMBER() OVER (PARTITION BY token ORDER BY mr) AS rn
    FROM (${(1 to K).map(i =>
        s"SELECT $i AS mr, a || b AS token FROM m$i")
        .mkString(" UNION ALL ")}))
  WHERE rn = 1),
bchr AS (SELECT chr(m::INT) AS ch, b FROM bmap),
vchar AS (
  SELECT id, CAST(j AS BIGINT) AS j,
    substr(token, CAST(j AS INT), 1) AS ch
  FROM (SELECT id, token, unnest(range(1, length(token) + 1)) AS j
    FROM vocab)),
vhex AS MATERIALIZED (
  SELECT id, string_agg(lpad(to_hex(bc.b), 2, '0'), '' ORDER BY j)
    AS hx
  FROM vchar JOIN bchr bc ON bc.ch = vchar.ch GROUP BY id),
enc AS (
  SELECT doc_id,
    flatten(list_transform($words,
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, bl, ${(1 to K).map("m" + _).mkString(", ")}),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, toks[i] AS t
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
    FROM enc)),
tid AS (
  SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(v.id) AS BIGINT) AS id_sum,
    string_agg(h.hx, '' ORDER BY k.i) AS hex
  FROM tok k JOIN vocab v ON v.token = k.t JOIN vhex h ON h.id = v.id
  GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(id_sum, 0) AS BIGINT) AS id_sum,
  decode(from_hex(coalesce(hex, ''))) = coalesce(text, '')
    AS round_trip_ok,
  substr(decode(from_hex(coalesce(hex, ''))), 1, 24) AS decoded_head
FROM documents d LEFT JOIN tid USING (doc_id)
ORDER BY doc_id"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      val bcV = s.sparkContext.broadcast(Bpe.idVocab(merges))
      val bcI = s.sparkContext.broadcast(Bpe.idVocabInverse(merges))
      import s.implicits._
      val dec = Bpe.encodeBytesScalable(docs, "doc_id", "text", merges)
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val v = bcV.value
          val iv = bcI.value
          it.map { case (id, toks) =>
            // the shard: integer ids ONLY — token strings forgotten
            val ids: Seq[Long] =
              if (toks == null) Seq.empty else toks.map(v)
            var sum = 0L
            val sb = new java.lang.StringBuilder
            ids.foreach { i => sum += i; sb.append(iv(i)) }
            val decoded = new String(Bpe.byteUnmapLocal(sb.toString),
              java.nio.charset.StandardCharsets.UTF_8)
            (id, ids.size.toLong, sum, decoded)
          }
        }
        .toDF("doc_id", "n_tokens", "id_sum", "decoded")
      dec.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("id_sum"),
          (col("decoded") === coalesce(col("text"), lit("")))
            .as("round_trip_ok"),
          substring(col("decoded"), 1, 24).as("decoded_head"))
        .orderBy("doc_id")
    },

    // TOKENIZER DOMAIN ADAPTATION — the production lifecycle a
    // shipped tokenizer actually lives: a BASE table trained on the
    // home domain (src0, 8 merges) is PERSISTED, reloaded, and
    // CONTINUED on a new domain's vocabulary (src1, 4 more merges —
    // trainLocal's initialMerges hook: the src1 vocab is first
    // rewritten under the base table in rank order, new merges take
    // ranks 9..12), and the ADAPTED artifact is persisted, reloaded
    // and used to encode the whole corpus. The oracle replays the
    // full lifecycle: the 8-stage base chain over src0, the src1
    // vocabulary REWRITTEN through the base nested-replace chain (the
    // continuation's starting vocab — `w0Override`), 4 more stages,
    // then the 12-table encode chain in base-then-adapt order and a
    // checksum over all 12 (rank:lhs:rhs) rows from BOTH stores. A
    // wrong rewrite, a continuation rank off by one, or either store
    // corrupting a merge flips the hash.
    QueryDef("pipeline_tokenizer_adapt", {
      val baseK = 8
      val adaptK = 4
      val baseTables = (1 to baseK).map("xm" + _)
      val adaptTables = (1 to adaptK).map("ym" + _)
      val all = baseTables ++ adaptTables
      val checksum = (baseTables.zipWithIndex.map { case (t, i) =>
        sqlH31(s"CAST(${i + 1} AS VARCHAR) || ':' || $t.a || ':' || $t.b")
      } ++ adaptTables.zipWithIndex.map { case (t, i) =>
        sqlH31(s"CAST(${baseK + i + 1} AS VARCHAR) || ':' || $t.a" +
          s" || ':' || $t.b")
      }).mkString(" + ")
      val yw0 =
        s"SELECT ${sqlEncodeChainTables(baseTables,
          "regexp_replace(word, '(.)', ' \\1 ', 'g')")} AS w, freq" +
          s"\n  FROM ywf, ${baseTables.mkString(", ")}"
      "WITH " + sqlTrainCtes(baseK, " WHERE source = 'src0'", "x") +
        ",\n" +
        sqlTrainCtes(adaptK, " WHERE source = 'src1'", "y",
          w0Override = Some(yw0)) + s""",
mc AS (
  SELECT CAST($checksum AS BIGINT) AS merge_checksum
  FROM ${all.mkString(", ")}),
enc AS (
  SELECT doc_id,
    flatten(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> string_split(trim(${sqlEncodeChainTables(all)}), '  ')))
      AS toks
  FROM documents, ${all.mkString(", ")})
SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  array_to_string(toks[1:5], '|') AS head_tokens, merge_checksum
FROM enc, mc ORDER BY doc_id"""
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      // base train on the home domain, shipped through the store
      val base = Bpe.trainLocal(
        Bpe.wordFreq(docs.filter(col("source") === "src0"), "text"), 8)
      val root = graft.Scratch.dir("bpe-adapt", d)
      Bpe.saveTokenizer(s, s"$root/base", base, byteLevel = false)
      val baseArt = Bpe.loadTokenizer(s, s"$root/base")
      // continuation on the new domain, from the RELOADED base
      val more = Bpe.trainLocal(
        Bpe.wordFreq(docs.filter(col("source") === "src1"), "text"), 4,
        initialMerges = baseArt.merges)
      Bpe.saveTokenizer(s, s"$root/adapted", baseArt.merges ++ more,
        byteLevel = false)
      val art = Bpe.loadTokenizer(s, s"$root/adapted")
      val checksum = art.merges.map(m => TextAnalysis.tokenHash31Local(
        s"${m.rank}:${m.left}:${m.right}")).sum
      Bpe.encodeWithArtifact(docs, "doc_id", "text", art)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws("|", slice(col("tokens"), 1, 5)).as("head_tokens"),
          lit(checksum).as("merge_checksum"))
        .orderBy("doc_id")
    },

    // PRODUCTION-VOCAB TIMING DATAPOINT: the full trainLocal loop at
    // 8192 merges over the [[saltedCorpus]] surface, then the SAME
    // corpus encoded twice with encodeScalable \u2014 under the first 12
    // merges and under all 8192 (`take(12)` IS the k=12 table: the
    // continuation invariant is spec-pinned) \u2014 so the scaling curve
    // carries a measured >=8k-merge point and DevBpeK can contrast
    // encode wall-time in k. Correctness is rows-only (an 8192-stage
    // DuckDB replay chain is not writable), so the self-consistency
    // invariant is MACHINE-CHECKED in the plan instead: more merges
    // always compress further (n_tokens_kbig < n_tokens_k12 <
    // n_chars, the zero-merge symbol count) \u2014 [[compressionGuard]]
    // raise_errors the row if the trainer ever regresses, making the
    // rows-only grade fail loudly rather than shipping wrong totals.
    QueryDef.noOracle("pipeline_bpe_vocab8k") { (s, d) =>
      import s.implicits._
      val (words0, docs20) = saltedCorpus(s, d)
      // the word table is vocab-scale (Heaps' law) but its lineage is a
      // corpus-scale tokenize + per-token md5 salt; FOUR actions consume
      // it (the n_chars aggregate, trainLocal's footprint guard,
      // trainLocal's collect, the vocab_rows count) — materialize it
      // once so the salted tokenize runs one time, not four. Same for
      // the salted document surface: TWO encode passes (k=12, k=8192)
      // would each re-run the per-token md5 transform
      val words = words0.localCheckpoint(true)
      val docs2 = docs20.localCheckpoint(true)
      val nChars = words
        .agg(sum(col("freq") * length(col("word")))).head().getLong(0)
      val big = Bpe.trainLocal(words, 8192)
      def total(merges: Seq[Bpe.Merge]): Long =
        Bpe.encodeScalable(docs2, "doc_id", "text", merges)
          .agg(sum(size(col("tokens")))).head().getLong(0)
      // the k=12 and k=8192 encode passes are independent actions over
      // the checkpointed surface — submit them concurrently (the
      // dedup_suffix_cross_shard placement)
      val (t12, tBig) = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val f12 = Future(total(big.take(12)))
        val fBig = Future(total(big))
        (Await.result(f12, scala.concurrent.duration.Duration.Inf),
          Await.result(fBig, scala.concurrent.duration.Duration.Inf))
      }
      val out = compressionGuard(
        Seq((big.size.toLong, words.count(), nChars, t12, tBig))
          .toDF("merges_learned", "vocab_rows", "n_chars",
            "n_tokens_k12", "n_tokens_kbig"))
      words.unpersist()
      docs2.unpersist()
      out
    },

    // THE DATA FREEZE \u2014 raw corpus to training shards as ONE graded
    // query, the end-to-end shape every stage above was built for:
    //   1. curation gates (encoding U+FFFD gate, wordlist rate gate \u2014
    //      map-only filters, hazards planted from doc_id arithmetic),
    //   2. exact dedup (min-doc_id keeper per identical text \u2014 the
    //      fixture's planted full duplicates),
    //   3. C4 cross-document span dedup over the survivors (planted
    //      terminal punctuation, 3-sentence span keys, overlap-union
    //      drops, per-doc reassembly; all-dropped docs leave the
    //      freeze),
    //   4. BPE trained on the frozen src0 slice (trainLocal \u2014 the
    //      production trainer) and the WHOLE freeze encoded with
    //      encodeScalable (map-only, broadcast merge index),
    //   5. subword-budget packing (distributed prefix sum \u2014 range
    //      partition + driver offsets, never a single-reducer window),
    //   6. deterministic hash shard + per-shard integrity manifest
    //      (order-independent checksum, epoch-order endpoints, and a
    //      bin checksum that freezes the packing assignment).
    // The oracle replays EVERY stage: gates, keeper resolution, the
    // sentence/span chain, the 12-stage train chain, the encode
    // chain, the prefix-sum window, shard keys and all manifest
    // columns \u2014 one mis-ordered gate, one wrong keeper, one span off
    // by a sentence, one token miscounted, one doc in the wrong bin
    // or shard flips the hash. Shuffle budget: gates are map-only;
    // the corpus-scale exchanges are exact-dedup's text groupBy, the
    // span-hash shuffle, wordFreq, the prefix-sum range partition and
    // the shard groupBy \u2014 each keyed, none quadratic; plan contract
    // (no cartesian) is spec-asserted.
    QueryDef("pipeline_data_freeze", sqlDataFreeze) { (s, d) =>
      // stages 1-2: map-only curation gates (funnel semantics)
      val d0 = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        concat(col("text"), when(col("doc_id") % 13 === 0,
          lit(" \ufffd")).otherwise(lit(""))).as("text"))
      val s1 = d0.filter(!col("text").contains("\ufffd"))
      val s2 = s1.filter(
        size(filter(TextAnalysis.tokens(col("text")),
          t => t.isin("slow", "big"))) * 1000 <=
          lit(100) * size(TextAnalysis.tokens(col("text"))))
      // stage 3: exact dedup, min-doc_id keeper per identical text
      val s3 = s2.join(
        s2.groupBy("text").agg(min("doc_id").as("doc_id"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
      // stage 4: C4 span dedup over the survivors; all-dropped docs
      // (empty kept_text) leave the freeze
      val plantedCol = array_join(
        transform(TextAnalysis.tokens(col("text")),
          t => concat(t,
            when(TextAnalysis.tokenHash31(t) % 5 === 0, lit("."))
              .otherwise(lit("")))), " ")
      val span = graft.ext.Dedup.spanDedup(
        s3.select(col("doc_id"), plantedCol.as("__p")), "doc_id", "__p")
      // the frozen corpus feeds THREE consumers (tokenizer train,
      // encode, manifest join) \u2014 checkpoint so the gate+dedup prefix
      // computes once
      val frozen = s3.select("doc_id", "source")
        .join(span.filter(length(col("kept_text")) > 0)
          .select(col("doc_id"), col("kept_text").as("text")),
          Seq("doc_id"))
        .localCheckpoint(false)
      // stage 5: tokenizer trained on the frozen src0 slice, whole
      // freeze encoded map-only
      val merges = Bpe.trainLocal(
        Bpe.wordFreq(frozen.filter(col("source") === "src0"), "text"), K)
      val enc = Bpe.encodeScalable(frozen, "doc_id", "text", merges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"))
      // stage 6: subword-budget packing (distributed prefix sum)
      val packed = graft.ops.PrefixSum.packIntoBins(enc,
          weight = col("n_tokens"), budget = 2048L,
          orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"),
          col("bin").cast("long").as("bin"))
      // stage 7: deterministic shard + integrity manifest
      val h = TextAnalysis.tokenHash31(
        concat(col("doc_id").cast("string"), lit("#freeze-1")))
      packed
        .join(frozen.select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("shard_id", h % 8)
        .withColumn("k", h * 10000000L + col("doc_id") % 10000000L)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("bin")).cast("long").as("bin_checksum"),
          sum(TextAnalysis.tokenHash31(concat(
            col("doc_id").cast("string"), lit("|"), col("text"))))
            .cast("long").as("checksum"),
          min_by(col("doc_id"), col("k")).as("first_doc"),
          max_by(col("doc_id"), col("k")).as("last_doc"))
        .orderBy("shard_id")
    },

    // FREEZE EXPORT — the streaming freeze's missing tail, graded:
    // the corpus flows through THREE incremental freezeBatch
    // micro-batches (monotone doc_id ranges; gates, exact + span
    // dedup against the accumulated key stores, fixed-table encode —
    // every store write a batch_id dynamic overwrite), and the EXPORT
    // then reads ONLY the frozen-doc store (explicit schema — the
    // empty-first-batch lesson) and assigns packing bins + shard
    // manifest over it. The store already carries n_tokens, so the
    // export never re-reads or re-encodes the corpus: at 100 TB the
    // freeze is amortized across micro-batches (the stream has been
    // writing the store all along) and shipping training shards costs
    // one prefix sum + one shard agg over the frozen store — which is
    // why the store build here runs ONCE per fixture+JVM (marker-
    // gated; the construction is deterministic) and re-executions
    // grade the export plan, the production-shaped cost of this
    // query. The oracle is pipeline_data_freeze's replay VERBATIM
    // (same `sqlDataFreeze`): under monotone ids the incremental
    // stores must compose to exactly the batch flagship's freeze —
    // one gate evaluated differently on the streaming surface, one
    // history anti-join off by a batch, one store row lost or doubled
    // by a replay, and the two queries' shared oracle convicts the
    // broken one. The fixed merge table the stream ships is trained
    // batch-side on the frozen src0 slice, exactly the production
    // recipe ("a stream cannot train").
    QueryDef("pipeline_freeze_export", sqlDataFreeze) { (s, d) =>
      val root = graft.Scratch.dir("freeze-export", d)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(root, "_built")
      val Seq(tk, sk, fz, mf) =
        Seq("tk", "sk", "fz", "mf").map(n => s"$root/$n")
      if (!fs.exists(marker)) {
        // fresh stores for the build: a partial build without the
        // marker would leave its OWN later batches as history
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        // ---- batch-side freeze prefix, ONLY to train the fixed
        // merge table the stream ships with (identical to
        // pipeline_data_freeze stages 1-4; the graded output never
        // reads these frames) ----
        val d0 = Tables.documents(s, d).select(col("doc_id"),
          col("source"),
          concat(col("text"), when(col("doc_id") % 13 === 0,
            lit(" �")).otherwise(lit(""))).as("text"))
        val s1 = d0.filter(!col("text").contains("�"))
        val s2 = s1.filter(
          size(filter(TextAnalysis.tokens(col("text")),
            t => t.isin("slow", "big"))) * 1000 <=
            lit(100) * size(TextAnalysis.tokens(col("text"))))
        val s3 = s2.join(
          s2.groupBy("text").agg(min("doc_id").as("doc_id"))
            .select("doc_id"), Seq("doc_id"), "left_semi")
        val plantedCol = array_join(
          transform(TextAnalysis.tokens(col("text")),
            t => concat(t,
              when(TextAnalysis.tokenHash31(t) % 5 === 0, lit("."))
                .otherwise(lit("")))), " ")
        val span = graft.ext.Dedup.spanDedup(
          s3.select(col("doc_id"), plantedCol.as("__p")), "doc_id",
          "__p")
        val frozenB = s3.select("doc_id", "source")
          .join(span.filter(length(col("kept_text")) > 0)
            .select(col("doc_id"), col("kept_text").as("text")),
            Seq("doc_id"))
          .localCheckpoint(false)
        val trained = Bpe.trainLocal(
          Bpe.wordFreq(frozenB.filter(col("source") === "src0"),
            "text"), K)
        // the freeze SHIPS its tokenizer: persist the trained table
        // next to the stores and hand the stream the RELOADED
        // artifact — the production loop (batch train -> artifact
        // store -> encode fleets load it), so a store corruption
        // would flip the graded manifest through the encode
        Bpe.saveTokenizer(s, s"$root/tokenizer", trained,
          byteLevel = false)
        val merges = Bpe.loadTokenizer(s, s"$root/tokenizer").merges
        // ---- the STREAM side: the planted corpus through
        // freezeBatch. Planting happens BEFORE the stream (the stream
        // ingests final text), so the gate runs on planted tokens: a
        // wordlist token may carry its planted period — counting both
        // forms equals the batch gate on raw text (planting is per
        // token VALUE, and the raw fixture is period-free, so no
        // other token aliases in).
        val planted = d0.select(col("doc_id"), plantedCol.as("text"))
        val toks = TextAnalysis.tokens(col("text"))
        val gate = !col("text").contains("�") &&
          (size(filter(toks,
            t => t.isin("slow", "big", "slow.", "big."))) * 1000 <=
            lit(100) * size(toks))
        val maxId = d0.agg(max("doc_id")).head().getLong(0)
        val cuts = Seq(
          col("doc_id") <= lit(maxId / 3),
          col("doc_id") > lit(maxId / 3) &&
            col("doc_id") <= lit(2 * maxId / 3),
          col("doc_id") > lit(2 * maxId / 3))
        cuts.zipWithIndex.foreach { case (pred, bid) =>
          graft.streaming.CorpusStream.freezeBatch(
            planted.filter(pred), bid.toLong, gate, merges,
            tk, sk, fz, mf, seed = "freeze-1", numShards = 8)
        }
        fs.create(marker, true).close()
      }
      // ---- the EXPORT (the graded plan): frozen store -> packing
      // bins -> shard manifest. No corpus re-read, no re-encode —
      // the store's n_tokens is authoritative.
      val stored = s.read
        .schema("doc_id LONG, text STRING, n_tokens LONG, batch_id LONG")
        .parquet(fz)
        .select("doc_id", "text", "n_tokens")
      val packed = graft.ops.PrefixSum.packIntoBins(
          stored.select(col("doc_id"), col("n_tokens")),
          weight = col("n_tokens"), budget = 2048L,
          orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"),
          col("bin").cast("long").as("bin"))
      val h = TextAnalysis.tokenHash31(
        concat(col("doc_id").cast("string"), lit("#freeze-1")))
      packed
        .join(stored.select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("shard_id", h % 8)
        .withColumn("k", h * 10000000L + col("doc_id") % 10000000L)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("bin")).cast("long").as("bin_checksum"),
          sum(TextAnalysis.tokenHash31(concat(
            col("doc_id").cast("string"), lit("|"), col("text"))))
            .cast("long").as("checksum"),
          min_by(col("doc_id"), col("k")).as("first_doc"),
          max_by(col("doc_id"), col("k")).as("last_doc"))
        .orderBy("shard_id")
    }
  )
}
