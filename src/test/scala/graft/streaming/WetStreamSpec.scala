package graft.streaming

import graft.SparkSpec
import graft.ext.Warc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming WET ingest: record extraction per micro-batch, blob-keyed
  * last-write-wins on re-crawl, and the shared compaction contract
  * (bounded partition count, fold changes no read result). */
class WetStreamSpec extends SparkSpec {
  import spark.implicits._

  private def blob(payloads: (String, String)*): Array[Byte] =
    payloads.toArray.flatMap { case (uri, text) =>
      Warc.wetRecordBytes(uri, "2026-01-01T00:00:00Z", s"<urn:uuid:$uri>",
        text.getBytes("UTF-8"))
    }

  test("ingest, re-crawl last-write-wins, and compaction-stable read") {
    implicit val sqlCtx = spark.sqlContext
    val root = specTempDir("wet-stream")
    val store = s"$root/store"; val ckpt = s"$root/ckpt"
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = CorpusStream.wetIngestBatches(
      mem.toDF().toDF("blob_id", "payload"), store, ckpt,
      compactEvery = 2)
    try {
      // batch 0: blob 1 carries two records, blob 2 one
      mem.addData(
        (1L, blob("https://ex.example/a" -> "alpha one",
          "https://ex.example/b" -> "alpha two")),
        (2L, blob("https://ex.example/c" -> "beta")))
      q.processAllAvailable()
      val r0 = CorpusStream.readWetStore(spark, store)
        .select("blob_id", "rec_index", "target_uri", "text").collect()
      assert(r0.length == 3)

      // batch 1: blob 1 RE-CRAWLED down to a single record + new blob 3
      mem.addData(
        (1L, blob("https://ex.example/a2" -> "alpha refreshed")),
        (3L, blob("https://ex.example/d" -> "gamma")))
      q.processAllAvailable()
      val r1 = CorpusStream.readWetStore(spark, store)
        .select("blob_id", "rec_index", "target_uri", "text").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
      assert(r1.toSeq == Seq(
        (1L, 0, "https://ex.example/a2", "alpha refreshed"), // old 2 gone
        (2L, 0, "https://ex.example/c", "beta"),
        (3L, 0, "https://ex.example/d", "gamma")))

      // batch 2 triggers compaction (compactEvery=2): batches 0+1 fold
      // to one merged partition; the visible read must not change
      mem.addData((4L, blob("https://ex.example/e" -> "delta")))
      q.processAllAvailable()
      val r2 = CorpusStream.readWetStore(spark, store)
        .select("blob_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(r2.toSeq == Seq((1L, "alpha refreshed"), (2L, "beta"),
        (3L, "gamma"), (4L, "delta")))
      val partDirs = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).sorted
      assert(partDirs.length == 2, s"expected folded store: ${partDirs.toSeq}")
    } finally q.stop()
  }

  test("streaming trained-quality gate keeps model-accepted docs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val train = Seq(
      (0L, "good solid prose here", true),
      (1L, "spam junk junk spam", false),
      (2L, "more good prose text", true),
      (3L, "junk spam junk spam", false)).toDF("doc_id", "text", "y")
    val model = graft.ext.TextAnalysis.logisticTrain(
      train, "doc_id", "text", "y", dim = 64, iters = 8)
    val root = specTempDir("qgate")
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStream.qualityGateBatches(
      mem.toDF().toDF("doc_id", "text"), model,
      s"$root/store", s"$root/ckpt", dim = 64)
    try {
      mem.addData(
        (10L, "good prose all the way"),
        (11L, "spam junk spam junk junk"))
      q.processAllAvailable()
      mem.addData((12L, "solid good text prose"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$root/store")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(10L, 12L), s"got ${kept.toSeq}")
    } finally q.stop()
  }
}
