package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tool-call (agentic) SFT shards — the FIFTH trainer-shard family
  * (pretrain packing → SFT → VLM → DPO → FIM → TOOL): multi-turn
  * conversations where the assistant invokes tools and conditions on
  * their results:
  *
  * {{{
  *   [BOS] [USER] question [EOS]
  *     ( [ASSISTANT] [TOOLCALL] json-call [EOS]
  *       [TOOLRES] result [EOS] )×R
  *   [ASSISTANT] answer [EOS]
  * }}}
  *
  * Loss mask: 1 on assistant content INCLUDING the serialized call
  * tokens (the model must learn to emit the invocation) and the EOS
  * closing each assistant turn; 0 on all scaffold (role markers, the
  * TOOLCALL/TOOLRES sentinels), user content, and TOOL RESULTS —
  * observations are conditioned on, never predicted. Ids per
  * [[Bpe.ToolSpecials]] (text-only 0..5 unchanged, `<|tool_call|>` =
  * 6, `<|tool_result|>` = 7, learned offset 8 — the per-family
  * extension discipline).
  *
  * Tool calls are STRICT-SCHEMA JSON (`{"name":..., "args":{"q":...}}`),
  * and the engine must actually PARSE them (`from_json`, both name
  * and args.q required): docs with `doc_id % 11 == 0` plant a
  * TRUNCATED call and must be rejected by the parse, not by
  * arithmetic — the oracle knows the valid set arithmetically (the
  * `mm_container_meta` grading pattern), so an engine that
  * over-accepts or over-rejects changes the row set and fails.
  * Rounds R = doc_id % 2 + 1; every content slice is deterministic
  * doc-word arithmetic; conversations pack into fixed Ctx windows via
  * the distributed prefix sum with per-(window, piece) hash-strict
  * grading, exactly `pipeline_sft_shards`' rigor.
  */
object ToolQueries {

  import BpeQueries.{K, sqlByteMapCtes, sqlEncodeChain, sqlPretokBytes,
    sqlTrainCtes}
  import SftQueries.sqlWords

  /** Context-window token budget (the SFT/VLM value). */
  private val Ctx = 256L

  /** Learned-id offset under [[Bpe.ToolSpecials]]. */
  private val S = Bpe.ToolSpecials.size

  private def sqlJson(qLo: Int): String =
    s"""'{"name":"fn' || CAST(doc_id % 7 AS VARCHAR) ||
      '","args":{"q":"' ||
      coalesce(array_to_string(w[$qLo:${qLo + 3}], ' '), '') || '"}}'"""

  private def sqlSlice(lo: Int): String =
    s"coalesce(array_to_string(w[$lo:${lo + 3}], ' '), '')"

  /** The shared oracle CTE chain, ending at `pc` (one row per
    * (window, piece)) — each graded view appends its own SELECT. */
  private def sqlToolCtes: String =
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
  FROM documents WHERE doc_id % 11 <> 0),
msg AS (
  SELECT doc_id, CAST(u AS BIGINT) AS u,
    CASE
      WHEN u = 0 THEN ${sqlSlice(1)}
      WHEN u = 1 THEN ${sqlJson(5)}
      WHEN u = 2 THEN ${sqlSlice(9)}
      WHEN u = 3 THEN ${sqlJson(13)}
      WHEN u = 4 THEN ${sqlSlice(17)}
      ELSE CASE WHEN doc_id % 2 = 0 THEN ${sqlSlice(13)}
        ELSE ${sqlSlice(21)} END
    END AS content
  FROM (SELECT doc_id, w, unnest(
      CASE WHEN doc_id % 2 = 0 THEN [0, 1, 2, 5]
        ELSE [0, 1, 2, 3, 4, 5] END) AS u
    FROM ws)),
enc AS (
  SELECT doc_id, u,
    flatten(list_transform(${sqlWords("content")},
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM msg, bl, ${(1 to K).map("m" + _).mkString(", ")}),
tok AS (
  SELECT doc_id, u, CAST(j AS BIGINT) AS j, toks[j] AS t
  FROM (SELECT doc_id, u, toks, unnest(range(1, len(toks) + 1)) AS j
    FROM enc)),
cid AS (
  SELECT doc_id, u, list(v.id ORDER BY k.j) AS cids
  FROM tok k JOIN vocab v ON v.token = k.t
  GROUP BY doc_id, u),
mstream AS (
  SELECT m.doc_id, m.u,
    CASE
      WHEN m.u = 0 THEN [CAST(${Sft.UserId} AS BIGINT)]
        || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)]
      WHEN m.u IN (1, 3) THEN [CAST(${Sft.AsstId} AS BIGINT),
          CAST(${Sft.ToolCallId} AS BIGINT)]
        || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)]
      WHEN m.u IN (2, 4) THEN [CAST(${Sft.ToolResId} AS BIGINT)]
        || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)]
      ELSE [CAST(${Sft.AsstId} AS BIGINT)]
        || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)]
    END AS ids,
    CASE
      WHEN m.u IN (1, 3) THEN
        [CAST(0 AS BIGINT), CAST(0 AS BIGINT)]
        || coalesce(list_transform(c.cids, x -> CAST(1 AS BIGINT)), [])
        || [CAST(1 AS BIGINT)]
      WHEN m.u = 5 THEN [CAST(0 AS BIGINT)]
        || coalesce(list_transform(c.cids, x -> CAST(1 AS BIGINT)), [])
        || [CAST(1 AS BIGINT)]
      ELSE list_transform(range(0, 2 + len(coalesce(c.cids, []))),
        x -> CAST(0 AS BIGINT))
    END AS msk
  FROM msg m LEFT JOIN cid c ON c.doc_id = m.doc_id AND c.u = m.u),
conv AS (
  SELECT doc_id,
    [CAST(${Sft.BosId} AS BIGINT)] || flatten(list(ids ORDER BY u))
      AS ids,
    [CAST(0 AS BIGINT)] || flatten(list(msk ORDER BY u)) AS msk
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

  /** Shared verbatim by `pipeline_tool_shards` and its freeze-store
    * export (`export_tool_shards`) — one SQL string, one grade. */
  private[queries] def sqlToolShards: String = sqlToolCtes + s"""
SELECT chunk_id,
  CAST(row_number() OVER (PARTITION BY chunk_id ORDER BY local_start)
    AS BIGINT) AS seg_id,
  doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS n_calls,
  CAST(local_start AS BIGINT) AS local_start,
  CAST(piece_len AS BIGINT) AS piece_len,
  CAST(list_sum(msk[o + 1 : o + piece_len]) AS BIGINT) AS train_tokens,
  CAST(list_sum(ids[o + 1 : o + piece_len]) AS BIGINT) AS piece_id_sum,
  array_to_string(ids[o + 1 : o + least(3, piece_len)], '|')
    AS piece_head
FROM pc ORDER BY chunk_id, seg_id"""

  /** The full construction over an already-frozen corpus frame and an
    * already-trained merge table — `pipeline_tool_shards` trains
    * in-query; `export_tool_shards` feeds it the freeze store and the
    * reloaded artifact. */
  private[queries] def toolShards(s: SparkSession, docs: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame =
    toolPieces(s, docs, merges)
      .withColumn("seg_id", row_number().over(
        Window.partitionBy(col("chunk_id"))
          .orderBy(col("local_start"))).cast("long"))
      .select(col("chunk_id"), col("seg_id"), col("doc_id"),
        (col("doc_id") % 2 + 1).cast("long").as("n_calls"),
        col("local_start").cast("long"),
        col("piece_len").cast("long"),
        col("train_tokens"), col("piece_id_sum"), col("piece_head"))
      .orderBy("chunk_id", "seg_id")

  /** The shared (window, piece) frame both graded views fold. */
  private[queries] def toolPieces(s: SparkSession, docs: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame = {
    val bc = s.sparkContext.broadcast(
      Bpe.idVocabWithSpecials(merges, Bpe.ToolSpecials))
    val words = docs.select(col("doc_id"),
      filter(split(coalesce(col("text"), lit("")), " "),
        w => length(w) > 0).as("w"))
    def sl(lo: Int): Column =
      coalesce(array_join(slice(col("w"), lo, 4), " "), lit(""))
    def json(q: Column): Column = concat(
      lit("{\"name\":\"fn"), (col("doc_id") % 7).cast("string"),
      lit("\",\"args\":{\"q\":\""), q, lit("\"}}"))
    // planted hazard: every 11th doc truncates its first call — the
    // closing brace is missing, so ONLY a real JSON parse rejects it
    val j0 = when(col("doc_id") % 11 === 0,
        concat(lit("{\"name\":\"fn"),
          (col("doc_id") % 7).cast("string"),
          lit("\",\"args\":{\"q\":\""), sl(5), lit("\"}")))
      .otherwise(json(sl(5)))
    val j1 = json(sl(13))
    val callSchema = "name string, args struct<q string>"
    def parsedOk(c: Column): Column = {
      val p = from_json(c, callSchema, Map.empty[String, String])
      p.getField("name").isNotNull &&
        p.getField("args").getField("q").isNotNull
    }
    // STRICT validation: every call present in the conversation must
    // parse under the schema; R = doc_id % 2 + 1 rounds
    val twoRounds = col("doc_id") % 2 === 1
    val valid = words
      .withColumn("j0", j0).withColumn("j1", j1)
      .filter(parsedOk(col("j0")) &&
        (!twoRounds || parsedOk(col("j1"))))
    // unit fan-out: composite key doc_id*8 + u (u <= 5 < 8); absent
    // rounds yield null content and are filtered before the encode
    val units = valid
      .select(col("doc_id"), explode(array(
        struct(lit(0L).as("u"), sl(1).as("content")),
        struct(lit(1L).as("u"), col("j0").as("content")),
        struct(lit(2L).as("u"), sl(9).as("content")),
        struct(lit(3L).as("u"),
          when(twoRounds, col("j1")).as("content")),
        struct(lit(4L).as("u"),
          when(twoRounds, sl(17)).as("content")),
        struct(lit(5L).as("u"),
          when(twoRounds, sl(21)).otherwise(sl(13)).as("content"))))
        .as("m"))
      .filter(col("m.content").isNotNull)
      .select((col("doc_id") * 8 + col("m.u")).as("k"),
        col("m.content").as("content"))
    import s.implicits._
    val per = Bpe.encodeBytesScalable(units, "k", "content", merges)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (k, toks) =>
          val content =
            if (toks == null) Seq.empty[Long] else toks.map(v)
          val u = (k % 8).toInt
          val (ids, msk) = u match {
            case 0 => Sft.renderMessage(content, assistant = false)
            case 1 | 3 => Sft.renderToolCall(content)
            case 2 | 4 => Sft.renderToolResult(content)
            case _ => Sft.renderMessage(content, assistant = true)
          }
          (k / 8, k % 8, ids, msk)
        }
      }
      .toDF("doc_id", "u", "ids", "msk")
    val conv = per.groupBy("doc_id")
      .agg(sort_array(collect_list(
        struct(col("u"), col("ids"), col("msk")))).as("ms"))
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

  val defs: Seq[QueryDef] = Seq(

    QueryDef("pipeline_tool_shards", sqlToolShards) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      toolShards(s, docs, merges)
    },

    // The per-WINDOW export (the `pipeline_sft_windows` shape for the
    // tool family): fill, PAD completion, trained-token mass — for
    // tool shards the trained mass is the serialized calls + answers
    // only, so a mask bit leaking onto a result or sentinel anywhere
    // in the window flips its row — and epoch-order endpoints.
    QueryDef("pipeline_tool_windows", sqlToolCtes + s"""
SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_pieces,
  CAST(SUM(piece_len) AS BIGINT) AS fill,
  CAST($Ctx - SUM(piece_len) AS BIGINT) AS pad_tokens,
  CAST(SUM(list_sum(msk[o + 1 : o + piece_len])) AS BIGINT)
    AS train_tokens,
  CAST(SUM(list_sum(ids[o + 1 : o + piece_len])) AS BIGINT)
    AS window_id_sum,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM pc GROUP BY chunk_id ORDER BY chunk_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      toolPieces(s, docs, merges)
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
