package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.BatchAssembly.lengthBucketedBatches]]
  * — the dataloader-feed shape when documents arrive as a stream: each
  * document lands in its power-of-two length band, takes a 1-based
  * `seq_in_bucket` that CONTINUES across micro-batches, and a
  * `batch_idx` grouping `batchSize` consecutive same-bucket sequences.
  *
  * State is ONE counter per bucket — bucket ids are binary digit
  * counts of a long, so at most 64 state rows ride for the stream's
  * lifetime regardless of corpus size (the domainQuota rank-memory
  * shape, with an even harder bound). Each micro-batch's bucket group
  * is sorted by (len, doc_id) for determinism (streams deliver
  * unordered); memory per group is one micro-batch's bucket slice —
  * the micro-batch sizing contract every stateful op here shares.
  * `NoTimeout`: a bucket's counter must outlive any lull.
  *
  * Differential contract (spec-pinned): on any single micro-batch the
  * output equals the batch-side assembly; across micro-batches the
  * per-bucket sequences stay dense and batches fill in arrival order
  * — equal to the batch window whenever arrival order respects the
  * (len, doc_id) order within each bucket.
  */
object BatchStream {

  final case class BucketSeen(n: Long)
  final case class BucketedDoc(doc_id: Long, bucket: Int, len: Long,
      seq_in_bucket: Long, batch_idx: Long)

  /** Assign streaming documents to length-bucketed training batches.
    *
    * @param docs streaming frame
    * @param idCol integral id (the within-group tie-break)
    * @param len integral length column/expression; rows with
    *            `len <= 0` are EXCLUDED (the batch-side contract)
    * @param batchSize rows per training batch within a bucket */
  def lengthBatches(docs: DataFrame, idCol: String, len: Column,
      batchSize: Long): Dataset[BucketedDoc] = {
    require(batchSize >= 1L,
      s"BatchStream.lengthBatches: batchSize >= 1 ($batchSize)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        len.cast("long").as("len"))
      .filter(col("len") > 0L)
      .withColumn("bucket", length(bin(col("len"))).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketSeen, BucketedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[(Long, Long, Int)],
         state: GroupState[BucketSeen]) =>
          val before = state.getOption.map(_.n).getOrElse(0L)
          // deterministic within-batch order: (len, id) — the batch
          // assembly's (len, tie) total order
          val sorted = rows.toArray.sortBy(r => (r._2, r._1))
          state.update(BucketSeen(before + sorted.length))
          sorted.iterator.zipWithIndex.map { case ((id, l, _), i) =>
            val seq = before + i + 1
            BucketedDoc(id, bucket, l, seq, (seq - 1) / batchSize)
          }
      }
  }
}
