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
    val out = Multimodal.Decoder.decode(df).collect()
    assert(out.length == 50)
    assert(out.forall(m => m.width >= 64 && m.width < 128 &&
      m.height >= 64 && m.height < 128 && m.channels == 3))
    // resize keeps aspect with shorter edge at the target
    assert(out.forall(m =>
      math.min(m.resized_w, m.resized_h) == Multimodal.Decoder.ResizeTarget))
    // features: real byte histogram, mass equals payload length
    assert(out.forall(m => m.features.length == 16 &&
      m.features.sum == m.byte_len))
    // determinism: same input -> same metadata
    val again = Multimodal.Decoder.decode(df).collect()
    assert(out.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  test("real PNG decode: checked-in 2x2 fixture through the pipeline") {
    val in = getClass.getResourceAsStream("/graft/fixture_2x2.png")
    assert(in != null, "fixture_2x2.png must be on the test classpath")
    val png = in.readAllBytes(); in.close()
    // pixels: (0,0,0) (255,255,255) / (255,0,0) (0,0,255) — BT.601
    // luminances 0, 255, 76, 29 => histogram bins 0, 15, 4, 1
    val df = Seq((7L, png)).toDF("doc_id", "payload")
    val m = Multimodal.Decoder.decode(df).collect().head
    assert(m.format == "png" && m.width == 2 && m.height == 2)
    assert(m.channels == 3 && m.byte_len == png.length.toLong)
    assert(m.resized_w == Multimodal.Decoder.ResizeTarget &&
      m.resized_h == Multimodal.Decoder.ResizeTarget)
    val expected = Seq.tabulate(16)(b =>
      if (b == 0 || b == 1 || b == 4 || b == 15) 1L else 0L)
    assert(m.features == expected, s"luminance histogram ${m.features}")
  }

  test("real JPEG decode: dims from an imageio round-trip") {
    // JPEG pixel values are codec-dependent; dims/channels are not —
    // encode a 5x3 image with imageio itself, then decode via the
    // pipeline and check the metadata side
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val df = Seq((8L, jpeg)).toDF("doc_id", "payload")
    val m = Multimodal.Decoder.decode(df).collect().head
    assert(m.format == "jpeg" && m.width == 5 && m.height == 3)
    assert(m.features.sum == 15L, "one histogram entry per pixel")
  }

  test("corrupt image payload falls back to the stub, not an exception") {
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    val df = Seq((9L, fake)).toDF("doc_id", "payload")
    val m = Multimodal.Decoder.decode(df).collect().head
    assert(m.format == "stub" && m.features.sum == fake.length.toLong)
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
