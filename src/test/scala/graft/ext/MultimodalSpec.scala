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

  test("perceptual hash: near-identical images collide, inverted differ") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // left-dark/right-bright gradient; a one-pixel tweak; the inverse
    val base = png((x, _) => if (x < 8) 0x101010 else 0xf0f0f0)
    val tweak = png((x, y) =>
      if (x == 3 && y == 3) 0x202020
      else if (x < 8) 0x101010 else 0xf0f0f0)
    val inverse = png((x, _) => if (x < 8) 0xf0f0f0 else 0x101010)
    val df = Seq((1L, base), (2L, tweak), (3L, inverse))
      .toDF("doc_id", "payload")
    val bands = Multimodal.Decoder.decode(df).collect()
      .map(m => m.doc_id -> m.phash_bands).toMap
    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
    assert(bands(1L) == bands(2L),
      "one tweaked pixel must not flip any pooled-cell bit")
    assert(hamming(bands(1L), bands(3L)) == 64,
      "inverting the image flips every above-mean bit")
  }

  test("stub perceptual hash is positional, not just a histogram") {
    // same byte multiset, different order => same histogram features
    // but different positional pHash
    val a = (" " * 50 + "~" * 50).getBytes("UTF-8")
    val b = ("~" * 50 + " " * 50).getBytes("UTF-8")
    assert(Multimodal.Decoder.phashBytes(a) !=
      Multimodal.Decoder.phashBytes(b))
    assert(Multimodal.Decoder.phashBytes(a) ==
      Multimodal.Decoder.phashBytes(a.clone()))
    assert(Multimodal.Decoder.phashBytes(Array.empty[Byte]) ==
      Seq(0L, 0L, 0L, 0L))
  }

  test("WAV header parse: real PCM metadata, codec-free") {
    // hand-crafted 2ch/16-bit/8kHz WAV with 32 frames (128 data bytes)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val data = Array.fill[Byte](128)(7)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++
      "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(8000 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val df = Seq((5L, wav)).toDF("doc_id", "payload")
    val m = Multimodal.Decoder.decodeWav(df).collect().head
    assert(m == Multimodal.WavMeta(5L, channels = 2, sample_rate = 8000,
      bits_per_sample = 16, n_frames = 32,
      duration_us = 32L * 1000000 / 8000))
    // format sniff agrees it's a RIFF container
    assert(Multimodal.Decoder.sniffOne(wav) == "riff")
  }

  test("WAV parse rejects non-WAV payloads instead of guessing") {
    val junk = Seq(
      (1L, "RIFFxxxxJUNK".getBytes ++ Array.fill[Byte](40)(0)),
      (2L, "not audio at all".getBytes),
      (3L, Array.empty[Byte]))
    val df = junk.toDF("doc_id", "payload")
    assert(Multimodal.Decoder.decodeWav(df).collect().isEmpty)
  }

  test("WAV parse survives hostile chunk sizes (no hang, no throw)") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val head = "RIFF".getBytes ++ le32(1000) ++ "WAVE".getBytes
    // unsigned size 0xFFFFFFF8: as Int it's negative — the pre-fix
    // `off += 8 + sz.toInt` never advanced (executor-hanging loop)
    val wrapNeg = head ++ "junk".getBytes ++ le32(0xFFFFFFF8) ++
      Array.fill[Byte](32)(0)
    // large positive size: Int offset overflow made the next
    // new String(payload, off, 4) throw instead of returning None
    val wrapPos = head ++ "junk".getBytes ++ le32(0x7FFFFFF0) ++
      Array.fill[Byte](32)(0)
    // zero-size chunk whose id repeats forever would also never advance
    // without the strict-increase guard... 8-byte step does advance, so
    // it terminates by running off the end
    val zeros = head ++ Array.fill[Byte](64)(0)
    for (p <- Seq(wrapNeg, wrapPos, zeros))
      assert(Multimodal.Decoder.parseWavMeta(1L, p).isEmpty)
    // a truncated terminal data chunk (declared bigger than the payload)
    // still parses — dataBytes clamps to what is actually present
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val data = Array.fill[Byte](64)(3)
    val truncated = "RIFF".getBytes ++ le32(36 + 128) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000 * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(0xFFFFFFF8) ++ data
    val m = Multimodal.Decoder.parseWavMeta(2L, truncated)
    assert(m.exists(_.n_frames == 32), m.toString)
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
