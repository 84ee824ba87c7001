package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Bpe, Multimodal, Sft}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VLM SFT shards — the multimodal sibling of `pipeline_sft_shards`:
  * each document becomes a captioning conversation whose USER turn is
  * the image (rendered as `n_patches` copies of the reserved
  * `<|image|>` placeholder id, patch budget parsed from the REAL
  * container header bytes — the `mm_interleaved_plan` ViT geometry)
  * and whose ASSISTANT turn is the document text through the
  * byte-level tokenizer; per-token loss masks are 0 across the entire
  * image span and user scaffold, 1 on assistant content + assistant
  * EOS; conversations pack into fixed context windows with mask
  * alignment preserved across window boundaries.
  *
  * Ids per [[Bpe.VlmSpecials]]: specials 0..6 (text-only ids 0..5
  * unchanged, `<|image|>` = 6), bytes 7..262, merge products
  * 262 + rank. The oracle re-derives the patch budgets from the
  * synthesis arithmetic (the Spark side must get the dims back OUT of
  * the bytes), re-trains the tokenizer, re-assigns every id under the
  * shifted offset, re-renders the interleaved template and masks, and
  * replays the window arithmetic — a wrong patch ceiling, a mask bit
  * on a placeholder, a stale learned-id offset, or an off-by-one at
  * any window boundary flips the hash.
  */
object VlmQueries {

  import BpeQueries.{K, sqlByteMapCtes, sqlEncodeChain,
    sqlPretokBytes, sqlTrainCtes}
  import SftQueries.sqlWords

  /** Context-window token budget (same as `pipeline_sft_shards`:
    * small enough that conversations span windows at every SF). */
  private val Ctx = 256L

  /** Learned-id offset under [[Bpe.VlmSpecials]]. */
  private val S = Bpe.VlmSpecials.size

  /** Shared verbatim by `pipeline_vlm_shards` and its freeze-store
    * export (`export_vlm_shards`) — one SQL string, one grade. */
  private[queries] def sqlVlmShards: String =
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
enc AS (
  SELECT doc_id,
    flatten(list_transform(${sqlWords("coalesce(text, '')")},
      w -> string_split(trim(${sqlEncodeChain(K)}), '  '))) AS toks
  FROM documents, bl, ${(1 to K).map("m" + _).mkString(", ")}),
tok AS (
  SELECT doc_id, CAST(j AS BIGINT) AS j, toks[j] AS t
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS j
    FROM enc)),
cid AS (
  SELECT doc_id, list(v.id ORDER BY k.j) AS cids
  FROM tok k JOIN vocab v ON v.token = k.t
  GROUP BY doc_id),
pat AS (
  SELECT doc_id,
    CAST(((doc_id % 200 + 1 + 13) // 14)
      * ((doc_id % 100 + 1 + 13) // 14) AS BIGINT) AS n_patches
  FROM documents),
conv AS (
  SELECT p.doc_id, p.n_patches,
    [CAST(${Sft.BosId} AS BIGINT), CAST(${Sft.UserId} AS BIGINT)]
      || list_transform(range(0, p.n_patches),
           x -> CAST(${Sft.ImgId} AS BIGINT))
      || [CAST(${Sft.EosId} AS BIGINT), CAST(${Sft.AsstId} AS BIGINT)]
      || coalesce(c.cids, []) || [CAST(${Sft.EosId} AS BIGINT)] AS ids,
    list_transform(range(0, p.n_patches + 4), x -> CAST(0 AS BIGINT))
      || coalesce(list_transform(c.cids, x -> CAST(1 AS BIGINT)), [])
      || [CAST(1 AS BIGINT)] AS msk
  FROM pat p LEFT JOIN cid c USING (doc_id)),
rr AS (
  SELECT doc_id, n_patches, ids, msk,
    CAST(SUM(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - len(ids) AS BIGINT) AS s,
    CAST(SUM(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS e
  FROM conv),
pc AS (
  SELECT doc_id, n_patches, ids, msk, CAST(c AS BIGINT) AS chunk_id,
    greatest(s, c * $Ctx) - c * $Ctx AS local_start,
    least(e, (c + 1) * $Ctx) - greatest(s, c * $Ctx) AS piece_len,
    greatest(s, c * $Ctx) - s AS o
  FROM (SELECT doc_id, n_patches, ids, msk, s, e,
      unnest(range(s // $Ctx, (e - 1) // $Ctx + 1)) AS c FROM rr))
SELECT chunk_id,
  CAST(row_number() OVER (PARTITION BY chunk_id ORDER BY local_start)
    AS BIGINT) AS seg_id,
  doc_id, n_patches, CAST(local_start AS BIGINT) AS local_start,
  CAST(piece_len AS BIGINT) AS piece_len,
  CAST(list_sum(msk[o + 1 : o + piece_len]) AS BIGINT) AS train_tokens,
  CAST(list_sum(ids[o + 1 : o + piece_len]) AS BIGINT) AS piece_id_sum,
  array_to_string(ids[o + 1 : o + least(3, piece_len)], '|')
    AS piece_head
FROM pc ORDER BY chunk_id, seg_id"""

  /** The full construction over an already-frozen corpus frame and an
    * already-trained merge table — `pipeline_vlm_shards` trains
    * in-query; `export_vlm_shards` feeds it the freeze store and the
    * reloaded artifact. */
  private[queries] def vlmShards(s: SparkSession, docs: DataFrame,
      merges: Seq[Bpe.Merge]): DataFrame = {
      val bc = s.sparkContext.broadcast(
        Bpe.idVocabWithSpecials(merges, Bpe.VlmSpecials))
      // patch budget out of the BYTES: the real container parser over
      // the shared PNG/JPEG fixture payload, ViT ceil(dim/14) grid.
      // LEFT join + in-plan raise_error (not inner): an unparseable
      // container must NAME its document, not silently drop it into
      // an opaque hash mismatch (r16 ADVICE)
      val dims = Multimodal.Decoder.decodeImageContainers(
          docs.select(col("doc_id"),
            MultimodalQueries.pngJpegPayload.as("payload")))
        .toDF()
        .select(col("doc_id"),
          (expr("(width + 13) div 14") * expr("(height + 13) div 14"))
            .cast("long").as("n_patches"))
      val enc = Bpe.encodeBytesScalable(
        docs.select(col("doc_id"),
          coalesce(col("text"), lit("")).as("text")),
        "doc_id", "text", merges)
      import s.implicits._
      val conv = enc.join(dims, Seq("doc_id"), "left")
        .withColumn("n_patches",
          when(col("n_patches").isNotNull, col("n_patches"))
            .otherwise(raise_error(concat(
              lit("vlm_shards: image container failed to parse for " +
                "doc_id="), col("doc_id").cast("string")))))
        .select(col("doc_id"), col("n_patches"), col("tokens"))
        .as[(Long, Long, Seq[String])]
        .mapPartitions { it =>
          val v = bc.value
          it.map { case (docId, nPatches, toks) =>
            val content =
              if (toks == null) Seq.empty[Long] else toks.map(v)
            // the graded template: [BOS] [USER] IMG*n [EOS]
            // [ASSISTANT] caption [EOS] — image span all mask-0,
            // caption + closing EOS mask-1
            val (ids, msk) = Sft.assembleConversation(Seq(
              Sft.renderMessage(
                Seq.fill(nPatches.toInt)(Sft.ImgId), assistant = false),
              Sft.renderMessage(content, assistant = true)))
            (docId, nPatches, ids, msk)
          }
        }
        .toDF("doc_id", "n_patches", "ids", "msk")
        .withColumn("n_tokens",
          coalesce(size(col("ids")), lit(0)).cast("long"))
      val packed = graft.ops.PrefixSum.packIntoBins(conv,
          weight = col("n_tokens"), budget = Ctx,
          orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_patches"), col("ids"),
          col("msk"), col("start_offset").as("s"),
          (col("start_offset") + col("n_tokens")).as("e"))
      val pieces = packed
        .select(col("doc_id"), col("n_patches"), col("ids"),
          col("msk"), col("s"), col("e"),
          explode(sequence(expr(s"s div $Ctx"),
            expr(s"(e - 1) div $Ctx"))).as("chunk_id"))
        .select(col("chunk_id"), col("doc_id"), col("n_patches"),
          (greatest(col("s"), col("chunk_id") * Ctx) -
            col("chunk_id") * Ctx).as("local_start"),
          (least(col("e"), (col("chunk_id") + 1L) * Ctx) -
            greatest(col("s"), col("chunk_id") * Ctx)).as("piece_len"),
          (greatest(col("s"), col("chunk_id") * Ctx) - col("s"))
            .as("o"),
          col("ids"), col("msk"))
        .select(col("chunk_id"), col("doc_id"), col("n_patches"),
          col("local_start"), col("piece_len"),
          expr("aggregate(slice(msk, CAST(o + 1 AS INT)," +
            " CAST(piece_len AS INT)), 0L, (a, x) -> a + x)")
            .as("train_tokens"),
          expr("aggregate(slice(ids, CAST(o + 1 AS INT)," +
            " CAST(piece_len AS INT)), 0L, (a, x) -> a + x)")
            .as("piece_id_sum"),
          expr("array_join(transform(slice(ids, CAST(o + 1 AS INT)," +
            " CAST(least(3, piece_len) AS INT))," +
            " x -> CAST(x AS STRING)), '|')").as("piece_head"))
      pieces
        .withColumn("seg_id", row_number().over(
          Window.partitionBy(col("chunk_id"))
            .orderBy(col("local_start"))).cast("long"))
        .select(col("chunk_id"), col("seg_id"), col("doc_id"),
          col("n_patches"), col("local_start").cast("long"),
          col("piece_len").cast("long"),
          col("train_tokens"), col("piece_id_sum"), col("piece_head"))
        .orderBy("chunk_id", "seg_id")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("pipeline_vlm_shards", sqlVlmShards) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      vlmShards(s, docs, merges)
    })
}
