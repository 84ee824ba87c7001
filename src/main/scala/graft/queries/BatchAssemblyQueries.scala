package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.BatchAssembly
import org.apache.spark.sql.functions._

/** Length-bucketed batch assembly — the padding-minimizing batching
  * step between packing and the training loop, graded per batch: the
  * oracle replays the power-of-two banding, the (len, doc_id) total
  * order and the fixed batch fill, then both sides account the
  * padding integer-exactly (`n_seqs * max_len - sum_len`, the pad
  * tokens a dense batch of the bucket's sequences would burn). A
  * wrong bucket edge, an unstable tie-break or a batch spanning two
  * buckets all flip the hash.
  *
  * The length key here is the whitespace token count (map-only to
  * compute); any monotone length statistic slots in — the tokenized
  * variant composes with `pipeline_token_ids`' subword counts.
  */
object BatchAssemblyQueries {

  /** Sequences per training batch. */
  private val B = 16

  /** The batching SQL over a source CTE providing (doc_id, n_tokens):
    * power-of-two banding, the (len, doc_id) order, fixed batch fill,
    * per-batch padding accounting — ONE definition shared by the
    * whitespace-length and tokenizer-length grades. */
  private def sqlBatchTail(src: String): String =
    s"""db AS (
  SELECT doc_id, n_tokens,
    CAST(length(bin(n_tokens)) AS INT) AS bucket
  FROM $src WHERE n_tokens > 0),
rk AS (
  SELECT bucket, n_tokens,
    row_number() OVER (PARTITION BY bucket
      ORDER BY n_tokens, doc_id) AS seq
  FROM db),
ba AS (
  SELECT bucket, CAST((seq - 1) // $B AS BIGINT) AS batch_idx,
    n_tokens
  FROM rk)
SELECT bucket, batch_idx,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(MIN(n_tokens) AS BIGINT) AS min_len,
  CAST(MAX(n_tokens) AS BIGINT) AS max_len,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
    AS padding_waste
FROM ba GROUP BY 1, 2
ORDER BY bucket, batch_idx"""

  /** The shared Spark-side batch aggregation over a (doc_id,
    * n_tokens) frame. */
  private def sparkBatches(lens: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    BatchAssembly.lengthBucketedBatches(lens, col("n_tokens"), B,
        col("doc_id"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).cast("long").as("n_seqs"),
        min(col("n_tokens")).cast("long").as("min_len"),
        max(col("n_tokens")).cast("long").as("max_len"),
        sum(col("n_tokens")).cast("long").as("sum_len"))
      .withColumn("padding_waste",
        (col("n_seqs") * col("max_len") - col("sum_len"))
          .cast("long"))
      .orderBy("bucket", "batch_idx")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_length_batches",
      s"""WITH dl AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '),
      v -> length(v) > 0)) AS BIGINT) AS n_tokens
  FROM documents),
""" + sqlBatchTail("dl")) { (s, d) =>
      val docs = Tables.documents(s, d)
      sparkBatches(docs.select(col("doc_id"),
        size(filter(graft.ext.TextAnalysis.tokens(col("text")),
          w => length(w) > 0)).cast("long").as("n_tokens")))
    },

    // The TOKENIZED variant: the length key is the graded BPE
    // tokenizer's subword count, so the batches a dataloader gets are
    // sized in the unit the model actually consumes — the end-to-end
    // tokenize -> bucket -> batch composition the length grade's doc
    // promises. The oracle re-trains the merge chain and re-counts
    // every document's subwords before replaying the same banding.
    QueryDef("pipeline_token_batches",
      "WITH " + BpeQueries.sqlTrainCtes(BpeQueries.K,
        " WHERE source = 'src0'") + s""",
tc AS (
  SELECT doc_id,
    CAST(coalesce(list_sum(list_transform(
      list_filter(string_split(text, ' '), v -> length(v) > 0),
      w -> len(string_split(trim(${BpeQueries.sqlEncodeChainTables(
        (1 to BpeQueries.K).map("m" + _))}), '  ')))), 0)
      AS BIGINT) AS n_tokens
  FROM documents, ${(1 to BpeQueries.K).map("m" + _).mkString(", ")}),
""" + sqlBatchTail("tc")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = graft.ext.Bpe.trainLocal(
        graft.ext.Bpe.wordFreq(
          docs.filter(col("source") === "src0"), "text"),
        BpeQueries.K)
      sparkBatches(
        graft.ext.Bpe.encodeScalable(docs, "doc_id", "text", merges)
          .select(col("doc_id"),
            coalesce(size(col("tokens")), lit(0)).cast("long")
              .as("n_tokens")))
    }
  )
}
