package graft.streaming

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming DSIR count maintenance: hash-bounded per-batch counts,
  * idempotent replay, and bit-exact weight parity with the batch path.
  */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed counts merge to the batch counts; weights from the " +
    "store reproduce dsirWeights bit for bit; replay cannot double-count") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val all = docs.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val (b1, b2) = all.splitAt(all.length / 2)
    val root = specTempDir("dsir-stream")
    val storeDir = root.resolve("counts").toString

    // simulate a CRASHED first attempt of batch 0: a partial, WRONG
    // count partition that the replay must fully replace
    Seq((0L, 999999L)).toDF("f", "cnt").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(storeDir)

    val mem = MemoryStream[(Long, String, String)]
    val q = DsirStream.countBatches(
      mem.toDF().toDF("doc_id", "source", "text"),
      storeDir, root.resolve("ckpt").toString)
    try {
      mem.addData(b1: _*); q.processAllAvailable() // batch 0 (replay)
      mem.addData(b2: _*); q.processAllAvailable() // batch 1
    } finally q.stop()

    // merged counts == one-shot batch counts, exact integers
    val got = DsirStream.readCounts(spark, storeDir)
      .as[(Long, Long)].collect().toMap
    val want = docs
      .select(explode(TextAnalysis.dsirFeatures(col("text"), 256)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, "merged stream counts must equal batch counts")
    assert(!got.values.exists(_ >= 999999L),
      "the crashed attempt's garbage partition must be gone")

    // weights served from the maintained store == batch dsirWeights,
    // bit for bit (same integers, same sorted fold)
    val target = docs.filter(col("source").isin("src0", "src1"))
    val fromStore = TextAnalysis.dsirScoreAgainstCounts(docs,
        DsirStream.readCounts(spark, storeDir), target, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val batch = TextAnalysis.dsirWeights(docs, target, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(fromStore == batch,
      "store-served weights must reproduce the batch path exactly")
    spark.catalog.clearCache()
  }

  test("compaction: partition count stays bounded, SUM-merge is exact, " +
    "and a crashed attempt's partial partition is dropped, not folded") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val all = docs.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val batches = all.grouped(math.max(1, all.length / 5)).toSeq.take(5)
    assert(batches.length == 5)
    val root = specTempDir("dsir-compact")
    val storeDir = root.resolve("counts").toString

    // crashed FIRST attempt of batch 2: a partial garbage partition
    // already on disk when the compaction-due batch replays — the fold
    // must exclude it (batch_id < current) and the rewrite drop it
    Seq((0L, 999999L)).toDF("f", "cnt").withColumn("batch_id", lit(2L))
      .write.partitionBy("batch_id").parquet(storeDir)

    val mem = MemoryStream[(Long, String, String)]
    val q = DsirStream.countBatches(
      mem.toDF().toDF("doc_id", "source", "text"),
      storeDir, root.resolve("ckpt").toString, compactEvery = 2)
    try batches.foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    // batch 4's compaction folded partitions 1..3 into batch_id=3,
    // then batch 4 wrote its own: exactly two batch_id dirs remain
    val dirs = new java.io.File(storeDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch_id=3", "batch_id=4"),
      s"partition count must be bounded by the compaction window: $dirs")

    // the exact-sum contract: merged counts equal the one-shot batch
    // counts over the SUBSET of docs actually streamed, garbage gone
    val streamed = batches.flatten.map(_._1).toSet
    val got = DsirStream.readCounts(spark, storeDir)
      .as[(Long, Long)].collect().toMap
    val want = docs.filter(col("doc_id").isin(streamed.toSeq: _*))
      .select(explode(TextAnalysis.dsirFeatures(col("text"), 256)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, "compaction must be an exact SUM-merge")
    assert(!got.values.exists(_ >= 999999L),
      "the crashed attempt's garbage rows must be dropped")
    spark.catalog.clearCache()
  }
}
