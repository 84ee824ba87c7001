package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle shard assembly (Bavarian et al., "Efficient
  * Training of Language Models to Fill in the Middle", 2022) — the
  * pretraining transformation that teaches infilling: each document's
  * CHARACTER stream splits at two deterministic cut points into
  * (prefix, middle, suffix); the three pieces are tokenized
  * INDEPENDENTLY (the paper's document-level character-split recipe —
  * the token-boundary breaks at the cuts are part of the method) and
  * reassembled with sentinel ids, middle LAST so autoregressive
  * training predicts it:
  *
  * {{{
  *   PSM: [BOS] [PRE] prefix [SUF] suffix [MID] middle [EOS]
  *   SPM: [BOS] [SUF] suffix [PRE] prefix [MID] middle [EOS]
  * }}}
  *
  * Modes alternate 50/50 by doc_id parity (the paper's joint
  * PSM+SPM mix). Cut points are pure doc_id arithmetic (no RNG —
  * replayable): u = 7919·doc_id mod (L+1), v = 104729·doc_id mod
  * (L+1), lo = min, hi = max. Ids per [[Bpe.FimSpecials]]: text-only
  * specials 0..5 unchanged, PRE/MID/SUF = 6/7/8, learned offset 9.
  * Streams pack into fixed windows via the distributed prefix sum —
  * the graded row carries the window assignment.
  *
  * The oracle re-derives the cuts, re-trains the tokenizer,
  * re-encodes all three pieces, re-assembles both modes and replays
  * the packing — a cut off by one character changes a piece's
  * tokenization and every downstream sum.
  */
object FimQueries {

  import BpeQueries.{K, sqlByteMapCtes, sqlEncodeChain, sqlPretokBytes,
    sqlTrainCtes}
  import SftQueries.sqlWords

  /** Context-window token budget for the packing assignment. */
  private val Ctx = 512L

  /** Learned-id offset under [[Bpe.FimSpecials]]. */
  private val S = Bpe.FimSpecials.size

  /** Shared verbatim by `pipeline_fim_shards` and its freeze-store
    * export (`export_fim_shards`) — one SQL string, one grade. */
  private[queries] def sqlFimShards: String =
    "WITH " + sqlByteMapCtes + ",\n" +
        sqlTrainCtes(K, ", bl WHERE source = 'src0'",
          wordExpr = sqlPretokBytes) + s""",
vocab AS MATERIALIZED (
  SELECT l[i + 1] AS token, CAST(i + $S AS BIGINT) AS id
  FROM bl, (SELECT unnest(range(0, 256)) AS i)
  UNION ALL
  SELECT token, id FROM (
    SELECT token, ${S + 255} + mr AS id,
      ROW_NUMBER() OVER (PARTITION BY token ORDER BY mr) AS rn
    FROM (${(1 to K).map(i =>
        s"SELECT $i AS mr, a || b AS token FROM m$i")
        .mkString(" UNION ALL ")}))
  WHERE rn = 1),
cuts AS (
  SELECT doc_id, t, L,
    least(u, v) AS lo, greatest(u, v) AS hi
  FROM (SELECT doc_id, t, L,
      (7919 * doc_id) % (L + 1) AS u,
      (104729 * doc_id) % (L + 1) AS v
    FROM (SELECT doc_id, coalesce(text, '') AS t,
        CAST(coalesce(length(text), 0) AS BIGINT) AS L
      FROM documents))),
u AS (
  SELECT doc_id, 0 AS which,
    substr(t, 1, CAST(lo AS INT)) AS content FROM cuts
  UNION ALL
  SELECT doc_id, 1,
    substr(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)) FROM cuts
  UNION ALL
  SELECT doc_id, 2,
    substr(t, CAST(hi + 1 AS INT), CAST(L - hi AS INT)) FROM cuts),
uenc AS (
  SELECT doc_id, which,
    flatten(list_transform(${sqlWords("content")},
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM u, bl, ${(1 to K).map("m" + _).mkString(", ")}),
utok AS (
  SELECT doc_id, which, CAST(j AS BIGINT) AS j, toks[j] AS t
  FROM (SELECT doc_id, which, toks,
      unnest(range(1, len(toks) + 1)) AS j FROM uenc)),
ucid AS (
  SELECT doc_id, which, list(v.id ORDER BY k.j) AS cids
  FROM utok k JOIN vocab v ON v.token = k.t
  GROUP BY doc_id, which),
asm AS (
  SELECT c.doc_id, c.lo, c.hi,
    coalesce(pe.cids, []) AS pre,
    coalesce(mi.cids, []) AS mid,
    coalesce(su.cids, []) AS suf
  FROM cuts c
  LEFT JOIN ucid pe ON pe.doc_id = c.doc_id AND pe.which = 0
  LEFT JOIN ucid mi ON mi.doc_id = c.doc_id AND mi.which = 1
  LEFT JOIN ucid su ON su.doc_id = c.doc_id AND su.which = 2),
st AS (
  SELECT doc_id, lo, hi,
    CASE WHEN doc_id % 2 = 0 THEN 'psm' ELSE 'spm' END AS mode,
    CAST(len(pre) AS BIGINT) AS n_prefix,
    CAST(len(mid) AS BIGINT) AS n_middle,
    CAST(len(suf) AS BIGINT) AS n_suffix,
    CASE WHEN doc_id % 2 = 0 THEN
      [CAST(${Sft.BosId} AS BIGINT), CAST(${Sft.FimPreId} AS BIGINT)]
        || pre || [CAST(${Sft.FimSufId} AS BIGINT)]
        || suf || [CAST(${Sft.FimMidId} AS BIGINT)]
        || mid || [CAST(${Sft.EosId} AS BIGINT)]
    ELSE
      [CAST(${Sft.BosId} AS BIGINT), CAST(${Sft.FimSufId} AS BIGINT)]
        || suf || [CAST(${Sft.FimPreId} AS BIGINT)]
        || pre || [CAST(${Sft.FimMidId} AS BIGINT)]
        || mid || [CAST(${Sft.EosId} AS BIGINT)]
    END AS ids
  FROM asm),
rr AS (
  SELECT doc_id, mode, lo, hi, n_prefix, n_middle, n_suffix, ids,
    CAST(SUM(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - len(ids) AS BIGINT) AS start_offset
  FROM st)
SELECT doc_id, mode, CAST(lo AS BIGINT) AS cut_lo,
  CAST(hi AS BIGINT) AS cut_hi,
  n_prefix, n_middle, n_suffix,
  CAST(len(ids) AS BIGINT) AS n_tokens,
  CAST(coalesce(list_sum(ids), 0) AS BIGINT) AS id_sum,
  array_to_string(ids[1:3], '|') AS head,
  start_offset, CAST(start_offset // $Ctx AS BIGINT) AS bin
FROM rr ORDER BY doc_id"""

  /** The full construction over an already-frozen corpus frame and an
    * already-trained merge table — `pipeline_fim_shards` trains
    * in-query; `export_fim_shards` feeds it the freeze store and the
    * reloaded artifact. */
  private[queries] def fimShards(s: SparkSession, docs: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame = {
      val bc = s.sparkContext.broadcast(
        Bpe.idVocabWithSpecials(merges, Bpe.FimSpecials))
      val cuts = docs
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"),
          coalesce(length(col("text")), lit(0)).cast("long").as("L"))
        .withColumn("u", (col("doc_id") * 7919L) % (col("L") + 1L))
        .withColumn("v", (col("doc_id") * 104729L) % (col("L") + 1L))
        .select(col("doc_id"), col("t"), col("L"),
          least(col("u"), col("v")).as("lo"),
          greatest(col("u"), col("v")).as("hi"))
      // one encode pass over the three character pieces per document
      // (composite key doc_id×{0 prefix, 1 middle, 2 suffix})
      val units = cuts.select(explode(array(
          struct((col("doc_id") * 3).as("k"),
            expr("substring(t, 1, CAST(lo AS INT))").as("content")),
          struct((col("doc_id") * 3 + 1).as("k"),
            expr("substring(t, CAST(lo + 1 AS INT)," +
              " CAST(hi - lo AS INT))").as("content")),
          struct((col("doc_id") * 3 + 2).as("k"),
            expr("substring(t, CAST(hi + 1 AS INT)," +
              " CAST(L - hi AS INT))").as("content")))).as("u"))
        .select(col("u.k").as("k"), col("u.content").as("content"))
      import s.implicits._
      val cids = Bpe.encodeBytesScalable(units, "k", "content", merges)
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val v = bc.value
          it.map { case (k, toks) =>
            (k / 3, k % 3,
              if (toks == null) Seq.empty[Long] else toks.map(v))
          }
        }
        .toDF("doc_id", "which", "cids")
      val asm = cids.groupBy("doc_id")
        .agg(
          first(when(col("which") === 0, col("cids")), ignoreNulls = true)
            .as("pre"),
          first(when(col("which") === 1, col("cids")), ignoreNulls = true)
            .as("mid"),
          first(when(col("which") === 2, col("cids")), ignoreNulls = true)
            .as("suf"))
      def seg(sentinel: Long, content: Column) =
        concat(array(lit(sentinel)), content)
      val psm = concat(array(lit(Sft.BosId)),
        seg(Sft.FimPreId, col("pre")), seg(Sft.FimSufId, col("suf")),
        seg(Sft.FimMidId, col("mid")), array(lit(Sft.EosId)))
      val spm = concat(array(lit(Sft.BosId)),
        seg(Sft.FimSufId, col("suf")), seg(Sft.FimPreId, col("pre")),
        seg(Sft.FimMidId, col("mid")), array(lit(Sft.EosId)))
      val st = cuts.select(col("doc_id"), col("lo"), col("hi"))
        .join(asm, Seq("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit("psm")).otherwise(lit("spm"))
            .as("mode"),
          col("lo").as("cut_lo"), col("hi").as("cut_hi"),
          size(col("pre")).cast("long").as("n_prefix"),
          size(col("mid")).cast("long").as("n_middle"),
          size(col("suf")).cast("long").as("n_suffix"),
          when(col("doc_id") % 2 === 0, psm).otherwise(spm).as("ids"))
        .withColumn("n_tokens",
          coalesce(size(col("ids")), lit(0)).cast("long"))
      graft.ops.PrefixSum.packIntoBins(st, weight = col("n_tokens"),
          budget = Ctx, orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("mode"), col("cut_lo"),
          col("cut_hi"), col("n_prefix"), col("n_middle"),
          col("n_suffix"), col("n_tokens"),
          coalesce(aggregate(col("ids"), lit(0L), (a, x) => a + x),
            lit(0L)).as("id_sum"),
          array_join(transform(slice(col("ids"), 1, 3),
            x => x.cast("string")), "|").as("head"),
          col("start_offset"), col("bin").cast("long").as("bin"))
        .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("pipeline_fim_shards", sqlFimShards) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      fimShards(s, docs, merges)
    })
}
