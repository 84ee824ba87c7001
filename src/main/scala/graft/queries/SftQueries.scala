package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT shard assembly — the last mile between the tokenizer suite and
  * a trainer's dataloader: deterministic chat transcripts rendered
  * through the fixed [[graft.ext.Sft]] template into ONE integer
  * token-id stream per conversation with a per-token LOSS MASK, then
  * packed into fixed-size context windows with mask alignment
  * preserved across window boundaries.
  *
  * Everything is integral, so the grade is hash-strict: the oracle
  * re-derives the transcripts, re-trains the tokenizer, re-assigns
  * every special/byte/merge id, re-renders the template, re-computes
  * the masks and replays the window arithmetic — one wrong special
  * id, a mask bit on a role marker, or an off-by-one at any window
  * boundary flips the hash.
  *
  * Two graded views over ONE shared pieces construction (both sides:
  * the Spark `sftPieces` frame and the SQL CTE chain through `pc`):
  * `pipeline_sft_shards` grades every (window, piece) — the boundary
  * arithmetic; `pipeline_sft_windows` grades the per-WINDOW export a
  * dataloader actually reads — fill, PAD completion to the fixed
  * context length (PAD id 0, mask 0 — id sums are pad-invariant by
  * construction, which the oracle exploits), trained-token mass and
  * epoch-order endpoints.
  */
object SftQueries {

  import BpeQueries.{K, sqlByteMap, sqlByteMapCtes, sqlEncodeChain,
    sqlPretokBytes, sqlTrainCtes}

  /** Context-window token budget. Small enough that conversations
    * span windows at every SF (the boundary arithmetic is the part
    * under test); the packing is budget-agnostic. */
  private val Ctx = 256L

  /** Number of reserved special ids — the learned-id offset. */
  private val S = Bpe.SftSpecials.size

  /** Byte-level pretokens of one string column as a DuckDB list
    * expression (the `pipeline_token_ids` words expression,
    * parameterized over the column). */
  private[queries] def sqlWords(c: String): String =
    s"list_filter(list_transform(regexp_extract_all($c," +
      " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^\\s\\p{L}\\p{N}]+|\\s+')," +
      s" t -> ${sqlByteMap("t")}), v -> length(v) > 0)"

  /** The shared oracle chain: transcripts → train → id vocab →
    * per-message encode → template render + masks → conversation
    * assembly → prefix-sum window split. Ends at CTE `pc` — one row
    * per (window, piece) with the conversation arrays and the local
    * offset `o` alongside, so each graded view appends its own final
    * SELECT. */
  private def sqlSftCtes: String =
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
ws AS (
  SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '),
    v -> length(v) > 0) AS w
  FROM documents),
msg AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, i % 2 = 1 AS asst,
    coalesce(array_to_string(w[4 * i + 1 : 4 * i + 4], ' '), '')
      AS content
  FROM (SELECT doc_id, w, unnest(range(0, doc_id % 5 + 2)) AS i
    FROM ws)),
enc AS (
  SELECT doc_id, i, asst,
    flatten(list_transform(${sqlWords("content")},
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM msg, bl, ${(1 to K).map("m" + _).mkString(", ")}),
tok AS (
  SELECT doc_id, i, CAST(j AS BIGINT) AS j, toks[j] AS t
  FROM (SELECT doc_id, i, toks, unnest(range(1, len(toks) + 1)) AS j
    FROM enc)),
cid AS (
  SELECT doc_id, i, list(v.id ORDER BY k.j) AS cids
  FROM tok k JOIN vocab v ON v.token = k.t
  GROUP BY doc_id, i),
mstream AS (
  SELECT m.doc_id, m.i,
    [CAST(CASE WHEN m.asst THEN ${Sft.AsstId} ELSE ${Sft.UserId} END
        AS BIGINT)]
      || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)] AS ids,
    [CAST(0 AS BIGINT)]
      || coalesce(list_transform(c.cids,
           x -> CAST(CASE WHEN m.asst THEN 1 ELSE 0 END AS BIGINT)), [])
      || [CAST(CASE WHEN m.asst THEN 1 ELSE 0 END AS BIGINT)] AS msk
  FROM msg m LEFT JOIN cid c ON c.doc_id = m.doc_id AND c.i = m.i),
conv AS (
  SELECT doc_id,
    [CAST(${Sft.BosId} AS BIGINT)] || flatten(list(ids ORDER BY i))
      AS ids,
    [CAST(0 AS BIGINT)] || flatten(list(msk ORDER BY i)) AS msk
  FROM mstream GROUP BY doc_id),
rr AS (
  SELECT doc_id, ids, msk,
    CAST(SUM(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - len(ids) AS BIGINT) AS s,
    CAST(SUM(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS e
  FROM conv),
pc AS (
  SELECT doc_id, ids, msk, CAST(c AS BIGINT) AS chunk_id,
    greatest(s, c * $Ctx) - c * $Ctx AS local_start,
    least(e, (c + 1) * $Ctx) - greatest(s, c * $Ctx) AS piece_len,
    greatest(s, c * $Ctx) - s AS o
  FROM (SELECT doc_id, ids, msk, s, e,
      unnest(range(s // $Ctx, (e - 1) // $Ctx + 1)) AS c FROM rr))"""

  /** The shared Spark construction: one row per (window, piece) with
    * the graded per-piece metrics. Transcript synthesis is the
    * text_chat_turns generator restricted to VALID alternation
    * (user/assistant strictly alternating, message count doc_id%5+2),
    * message content = the message's 4-word slice of the document
    * text (so the encode exercises the real corpus surface, not toy
    * strings). Template and mask per graft.ext.Sft: [BOS] then per
    * message [role marker] content-tokens [EOS]; mask 1 on assistant
    * content + assistant EOS only. Ids per Bpe.idVocabWithSpecials:
    * specials 0..5, bytes 6..261, merge products 261+rank. Packing
    * via the range-partitioned PrefixSum (never a single-reducer
    * window). */
  private def sftPieces(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
        "text"), K)
    sftPiecesFrom(s, docs, merges)
  }

  /** [[sftPieces]] parameterized over an ALREADY-frozen corpus and an
    * ALREADY-trained merge table — the export path
    * (`export_sft_shards`) feeds it the freeze store and the reloaded
    * tokenizer artifact; no re-gating, no re-training. */
  private[queries] def sftPiecesFrom(s: SparkSession, docs: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame = {
    // one broadcast table serves id assignment for every message —
    // the map-literal element_at lesson from pipeline_token_ids
    val bc = s.sparkContext.broadcast(Bpe.idVocabWithSpecials(merges))
    // transcript synthesis: message i's content is words
    // [4i+1, 4i+4] of the doc text (empty past the end — short docs
    // still carry the full template skeleton). The composite key
    // doc_id*8+i survives the encode pass (i <= 5 < 8), so role and
    // turn order are recoverable without a join.
    val msgs = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ((col("doc_id") % 5) + 1).cast("int"))).as("i"))
      .select((col("doc_id") * 8 + col("i")).as("k"),
        coalesce(array_join(slice(
          filter(split(coalesce(col("text"), lit("")), " "),
            w => length(w) > 0),
          (col("i") * 4 + 1).cast("int"), lit(4)), " "), lit(""))
          .as("content"))
    import s.implicits._
    val per = Bpe.encodeBytesScalable(msgs, "k", "content", merges)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (k, toks) =>
          val asst = (k % 8) % 2 == 1
          val content =
            if (toks == null) Seq.empty[Long] else toks.map(v)
          val (ids, msk) = Sft.renderMessage(content, asst)
          (k / 8, k % 8, ids, msk)
        }
      }
      .toDF("doc_id", "i", "ids", "msk")
    // conversation assembly: a conversation-keyed agg over <= 6
    // message rows each — bounded groups, one shuffle on doc_id
    val conv = per.groupBy("doc_id")
      .agg(sort_array(collect_list(
        struct(col("i"), col("ids"), col("msk")))).as("ms"))
      .select(col("doc_id"),
        concat(array(lit(Sft.BosId)), flatten(col("ms.ids")))
          .as("ids"),
        concat(array(lit(0L)), flatten(col("ms.msk"))).as("msk"))
      .withColumn("n_tokens",
        coalesce(size(col("ids")), lit(0)).cast("long"))
    val packed = graft.ops.PrefixSum.packIntoBins(conv,
        weight = col("n_tokens"), budget = Ctx,
        orderBy = Seq(col("doc_id")))
      .select(col("doc_id"), col("ids"), col("msk"),
        col("start_offset").as("s"),
        (col("start_offset") + col("n_tokens")).as("e"))
    packed
      .select(col("doc_id"), col("ids"), col("msk"), col("s"),
        col("e"),
        explode(sequence(expr(s"s div $Ctx"),
          expr(s"(e - 1) div $Ctx"))).as("chunk_id"))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("s"), col("chunk_id") * Ctx) -
          col("chunk_id") * Ctx).as("local_start"),
        (least(col("e"), (col("chunk_id") + 1L) * Ctx) -
          greatest(col("s"), col("chunk_id") * Ctx)).as("piece_len"),
        (greatest(col("s"), col("chunk_id") * Ctx) - col("s"))
          .as("o"),
        col("ids"), col("msk"))
      .select(col("chunk_id"), col("doc_id"), col("local_start"),
        col("piece_len"),
        expr("aggregate(slice(msk, CAST(o + 1 AS INT)," +
          " CAST(piece_len AS INT)), 0L, (a, x) -> a + x)")
          .as("train_tokens"),
        expr("aggregate(slice(ids, CAST(o + 1 AS INT)," +
          " CAST(piece_len AS INT)), 0L, (a, x) -> a + x)")
          .as("piece_id_sum"),
        expr("array_join(transform(slice(ids, CAST(o + 1 AS INT)," +
          " CAST(least(3, piece_len) AS INT))," +
          " x -> CAST(x AS STRING)), '|')").as("piece_head"))
  }

  /** The per-(window, piece) shards oracle — shared verbatim by
    * `pipeline_sft_shards` and its freeze-store export
    * (`export_sft_shards`): the export must reproduce the family
    * query bit-for-bit from the store, so they grade against ONE
    * SQL string. */
  private[queries] def sqlSftShards: String = sqlSftCtes + s"""
SELECT chunk_id,
  CAST(row_number() OVER (PARTITION BY chunk_id ORDER BY local_start)
    AS BIGINT) AS seg_id,
  doc_id, CAST(local_start AS BIGINT) AS local_start,
  CAST(piece_len AS BIGINT) AS piece_len,
  CAST(list_sum(msk[o + 1 : o + piece_len]) AS BIGINT) AS train_tokens,
  CAST(list_sum(ids[o + 1 : o + piece_len]) AS BIGINT) AS piece_id_sum,
  array_to_string(ids[o + 1 : o + least(3, piece_len)], '|')
    AS piece_head
FROM pc ORDER BY chunk_id, seg_id"""

  /** The graded tail over a pieces frame: per-window seg_id rank
    * (bounded group, <= Ctx pieces) and the final projection. */
  private[queries] def sftShardTail(pieces: DataFrame): DataFrame =
    pieces
      .withColumn("seg_id", row_number().over(
        Window.partitionBy(col("chunk_id"))
          .orderBy(col("local_start"))).cast("long"))
      .select(col("chunk_id"), col("seg_id"), col("doc_id"),
        col("local_start").cast("long"),
        col("piece_len").cast("long"),
        col("train_tokens"), col("piece_id_sum"), col("piece_head"))
      .orderBy("chunk_id", "seg_id")

  val defs: Seq[QueryDef] = Seq(

    // SFT SHARDS — VERDICT r14's top ask. Graded per (window, piece):
    // window-local offset, piece length, the mask sum and id sum over
    // the EXACT slice of the conversation stream the piece covers,
    // and the piece's first three ids — sums pin the totals, heads
    // pin the order, and both must agree at every window boundary.
    // The per-window seg_id ranks a BOUNDED group (<= Ctx pieces).
    QueryDef("pipeline_sft_shards", sqlSftShards) { (s, d) =>
      sftShardTail(sftPieces(s, d))
    },

    // SFT WINDOWS — the fixed-length row a dataloader actually reads:
    // each context window's fill, its PAD completion to exactly Ctx
    // tokens (PAD id 0, mask 0 — so the padded window's id sum EQUALS
    // the piece-sum, an invariant the oracle grades by construction),
    // trained-token mass and epoch-order document endpoints. Every
    // non-final window must be exactly full (pad_tokens > 0 only on
    // the last window) — a packing drift that leaks slack into an
    // interior window flips its row.
    QueryDef("pipeline_sft_windows", sqlSftCtes + s"""
SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_pieces,
  CAST(SUM(piece_len) AS BIGINT) AS fill,
  CAST($Ctx - SUM(piece_len) AS BIGINT) AS pad_tokens,
  CAST(SUM(list_sum(msk[o + 1 : o + piece_len])) AS BIGINT)
    AS train_tokens,
  CAST(SUM(list_sum(ids[o + 1 : o + piece_len])) AS BIGINT)
    AS window_id_sum,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM pc GROUP BY chunk_id ORDER BY chunk_id""") { (s, d) =>
      sftPieces(s, d)
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("n_pieces"),
          sum(col("piece_len")).cast("long").as("fill"),
          (lit(Ctx) - sum(col("piece_len"))).cast("long")
            .as("pad_tokens"),
          sum(col("train_tokens")).cast("long").as("train_tokens"),
          sum(col("piece_id_sum")).cast("long").as("window_id_sum"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("chunk_id")
    })
}
