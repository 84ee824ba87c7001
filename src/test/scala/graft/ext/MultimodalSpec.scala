package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("sniffFormat recognizes magic bytes") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val txt = "plain text".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpeg), (3L, txt)).toDF("id", "payload")
    val got = df.select(col("id"), Multimodal.sniffFormat(col("payload")))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "unknown"))
  }

  test("decode pipeline: binary df -> typed metadata dataset, deterministic") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .limit(50)
    val out = Multimodal.StubDecoder.decode(df).collect()
    assert(out.length == 50)
    assert(out.forall(m => m.width >= 64 && m.width < 128 &&
      m.height >= 64 && m.height < 128 && m.channels == 3))
    // resize keeps aspect with shorter edge at the target
    assert(out.forall(m =>
      math.min(m.resized_w, m.resized_h) == Multimodal.StubDecoder.ResizeTarget))
    // features: real byte histogram, mass equals payload length
    assert(out.forall(m => m.features.length == 16 &&
      m.features.sum == m.byte_len))
    // determinism: same input -> same metadata
    val again = Multimodal.StubDecoder.decode(df).collect()
    assert(out.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  test("frame sampling windows advance by stride") {
    val df = Seq((1L, ("ab" * 200))).toDF("id", "text")
    val r = df.select(
      Multimodal.sampleFrameHex(col("text").cast("binary"), 0, 32, 8).as("f0"),
      Multimodal.sampleFrameHex(col("text").cast("binary"), 1, 32, 8).as("f1"))
      .as[(String, String)].collect()(0)
    assert(r._1.length == 16 && r._2.length == 16)
    assert(r._1 == "6162" * 4) // 'a'=61 'b'=62
  }
}
