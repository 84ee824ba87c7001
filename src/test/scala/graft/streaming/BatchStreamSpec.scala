package graft.streaming

import graft.SparkSpec
import graft.ops.BatchAssembly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming length-bucketed batch assembly vs its batch twin. */
class BatchStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming batches: sequences continue across micro-batches, " +
    "bucket state is a single counter, batch_idx fills in arrival " +
    "order, len <= 0 rows are excluded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = BatchStream.lengthBatches(
        mem.toDF().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        batchSize = 2L)
      .writeStream.format("memory").queryName("bs_out")
      .outputMode("append").start()
    try {
      // bucket(5,6,7)=3 digits; bucket(17)=5 digits; 0 excluded
      mem.addData((11L, 6L), (10L, 5L), (30L, 17L), (40L, 0L))
      q.processAllAvailable()
      // continuation: bucket 3 had 2 rows -> next seq is 3
      mem.addData((12L, 7L), (13L, 5L), (31L, 16L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bs_out")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // micro-batch 1, bucket 3 sorted by (len, id): 10 then 11
      (10L, 3, 5L, 1L, 0L), (11L, 3, 6L, 2L, 0L),
      (30L, 5, 17L, 1L, 0L),
      // micro-batch 2, bucket 3: (5,13) before (7,12); seqs 3, 4
      (13L, 3, 5L, 3L, 1L), (12L, 3, 7L, 4L, 1L),
      (31L, 5, 16L, 2L, 0L)), s"got $got")
    // per bucket: dense 1..n sequences across the whole stream
    got.groupBy(_._2).foreach { case (b, rows) =>
      assert(rows.map(_._4).toSeq.sorted == (1L to rows.size).toSeq,
        s"bucket $b sequences not dense")
    }
  }

  test("single micro-batch equals the batch-side assembly exactly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, 3L), (2L, 9L), (3L, 2L), (4L, 9L), (5L, 17L),
      (6L, 4L), (7L, 31L), (8L, 8L))
    val mem = MemoryStream[(Long, Long)]
    val q = BatchStream.lengthBatches(
        mem.toDF().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        batchSize = 2L)
      .writeStream.format("memory").queryName("bs_one")
      .outputMode("append").start()
    try { mem.addData(rows: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("bs_one")
      .select("doc_id", "bucket", "seq_in_bucket", "batch_idx")
      .as[(Long, Int, Long, Long)].collect().toSet
    val batch = BatchAssembly.lengthBucketedBatches(
        rows.toDF("doc_id", "n_tok"), col("n_tok"), 2L, col("doc_id"))
      .select(col("doc_id"), col("bucket"), col("seq_in_bucket"),
        col("batch_idx"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream $streamed\n != batch $batch")
  }

  test("multi-batch stream equals the batch window when arrival " +
    "respects per-bucket (len, id) order") {
    implicit val sqlCtx = spark.sqlContext
    // two waves; within each bucket the (len, id) keys of wave 1
    // precede wave 2's, so global order == arrival order
    val wave1 = Seq((1L, 2L), (2L, 3L), (10L, 16L), (11L, 17L))
    val wave2 = Seq((3L, 3L), (4L, 4L), (12L, 18L), (13L, 31L))
    val mem = MemoryStream[(Long, Long)]
    val q = BatchStream.lengthBatches(
        mem.toDF().toDF("doc_id", "n_tok"), "doc_id", col("n_tok"),
        batchSize = 3L)
      .writeStream.format("memory").queryName("bs_multi")
      .outputMode("append").start()
    try {
      mem.addData(wave1: _*); q.processAllAvailable()
      mem.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bs_multi")
      .select("doc_id", "bucket", "seq_in_bucket", "batch_idx")
      .as[(Long, Int, Long, Long)].collect().toSet
    val batch = BatchAssembly.lengthBucketedBatches(
        (wave1 ++ wave2).toDF("doc_id", "n_tok"), col("n_tok"), 3L,
        col("doc_id"))
      .select(col("doc_id"), col("bucket"), col("seq_in_bucket"),
        col("batch_idx"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
