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

  test("MP3 frame header: version/rate/channels/bitrate, ID3 skip, " +
    "CBR duration estimate") {
    // MPEG1 Layer III, 128 kbps, 44100 Hz, joint stereo:
    // FF FB (sync + MPEG1 + LIII + no CRC) 90 (bitrate idx 9, sr idx 0)
    // 40 (joint stereo)
    val frame = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x40)
    val body = frame ++ Array.fill[Byte](16000 - 4)(0x55)
    val bare = Multimodal.Decoder.parseMp3Meta(1L, body).get
    assert(bare.codec == "mp3" && bare.sample_rate == 44100 &&
      bare.channels == 2 && bare.bitrate_kbps == 128)
    // 16000 bytes at 128 kbps = 16000*8/128000 s = 1.0 s
    assert(bare.duration_us == 1000000L, bare.toString)
    assert(bare.n_frames == 44100L)
    // ID3v2 tag (syncsafe size 0x0100 = 128) + padding then the frame
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0x01, 0x00) ++
      Array.fill[Byte](128)(0)
    val tagged = Multimodal.Decoder.parseMp3Meta(2L, id3 ++ body).get
    assert(tagged.sample_rate == 44100 && tagged.duration_us == 1000000L)
    assert(Multimodal.Decoder.sniffOne(id3 ++ body) == "mp3")
    // MPEG2 branch: FF F3 (MPEG2 LIII) 40 (idx 4 -> 32kbps, 22050 Hz)
    val m2 = Array[Byte](0xFF.toByte, 0xF3.toByte, 0x40, 0x40) ++
      Array.fill[Byte](396)(0)
    val lo = Multimodal.Decoder.parseMp3Meta(3L, m2).get
    assert(lo.sample_rate == 22050 && lo.bitrate_kbps == 32)
    // hostile: truncated, free-bitrate, bad sample-rate idx, huge
    // syncsafe size — all None, no throw
    val junk = Seq(
      Array[Byte](0xFF.toByte, 0xFB.toByte),
      Array[Byte](0xFF.toByte, 0xFB.toByte, 0x00, 0x40), // free bitrate
      Array[Byte](0xFF.toByte, 0xFB.toByte, 0x9C.toByte, 0x40), // sr=3
      "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f),
      Array.empty[Byte])
    for (p <- junk)
      assert(Multimodal.Decoder.parseMp3Meta(9L, p).isEmpty)
  }

  test("FLAC STREAMINFO: exact rate/channels/bps/total-sample duration") {
    // fLaC + block header (type 0, len 34) + STREAMINFO with
    // rate=48000, channels=2, bps=16, total=96000 (2.0 s)
    def si: Array[Byte] = {
      val b = new Array[Byte](34)
      // bytes 10..12: rate 20 bits, ch-1 3 bits, bps-1 high bit
      // 48000 = 0x0BB80 -> b10=0x0B, b11=0xB8, high nibble b12=0
      b(10) = 0x0B; b(11) = 0xB8.toByte
      // b12: rate low nibble (0) | (ch-1=1)<<1 | (bps-1=15)>>4 = 0x02
      b(12) = 0x02
      // b13: (bps-1 low 4)<<4 | total bits 35..32 = 0xF0
      b(13) = 0xF0.toByte
      // total 96000 = 0x017700 in bytes 14..17
      b(14) = 0x00; b(15) = 0x01; b(16) = 0x77; b(17) = 0x00
      b
    }
    val flac = "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ si
    val m = Multimodal.Decoder.parseFlacMeta(4L, flac).get
    assert(m.codec == "flac" && m.sample_rate == 48000 &&
      m.channels == 2 && m.bits_per_sample == 16 &&
      m.n_frames == 96000L && m.duration_us == 2000000L, m.toString)
    assert(Multimodal.Decoder.sniffOne(flac) == "flac")
    // hostile: wrong first block type, short payload, zero rate
    assert(Multimodal.Decoder.parseFlacMeta(9L,
      "fLaC".getBytes ++ Array[Byte](4, 0, 0, 34) ++ si).isEmpty)
    assert(Multimodal.Decoder.parseFlacMeta(9L,
      "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34)).isEmpty)
    val zeroRate = flac.clone()
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = 0x00
    assert(Multimodal.Decoder.parseFlacMeta(9L, zeroRate).isEmpty)
  }

  test("decodeAudio dispatches WAV/MP3/FLAC in one pass, drops the rest") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val data = Array.fill[Byte](64)(1)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000 * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val mp3 = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x40) ++
      Array.fill[Byte](1596)(0)
    val flacSi = new Array[Byte](34)
    flacSi(10) = 0x0B; flacSi(11) = 0xB8.toByte; flacSi(12) = 0x02
    flacSi(13) = 0xF0.toByte; flacSi(16) = 0x77; flacSi(15) = 0x01
    val flac = "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ flacSi
    val df = Seq((1L, wav), (2L, mp3), (3L, flac),
      (4L, "not audio".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.Decoder.decodeAudio(df).collect()
      .map(m => m.doc_id -> m.codec).toMap
    assert(got == Map(1L -> "wav", 2L -> "mp3", 3L -> "flac"), got.toString)
  }

  test("MP4 box walk: brand, mvhd timescale/duration (v0 and v1), " +
    "track count — codec-free, hostile sizes bounded") {
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, body: Array[Byte]) =
      be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "mp42".getBytes)
    // mvhd v0: version+flags, creation, modification, timescale=600,
    // duration=3000 (5 seconds)
    val mvhd0 = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(3000))
    val moov0 = box("moov",
      mvhd0 ++ box("trak", Array[Byte]()) ++ box("trak", Array[Byte]()))
    val mp4v0 = ftyp ++ moov0
    // mvhd v1: 64-bit creation/modification/duration
    val mvhd1 = box("mvhd", be32(0x01000000L) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(450000L))
    val mp4v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", Array[Byte]()))
    // hostile: a box whose size points past EOF must yield None, not loop
    val hostile = ftyp ++ be32(0xfffffff0L) ++ "moov".getBytes
    val df = Seq((1L, mp4v0), (2L, mp4v1), (3L, hostile),
      (4L, "not a video".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.Decoder.decodeVideo(df).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    assert(got(1L) == Multimodal.VideoMeta(1L, "isom", 600L, 3000L,
      5000000L, 2), got(1L).toString)
    assert(got(2L) == Multimodal.VideoMeta(2L, "isom", 90000L, 450000L,
      5000000L, 1), got(2L).toString)
    // sniffers agree on the new format
    assert(Multimodal.Decoder.sniffOne(mp4v0) == "mp4")
    val sniffed = Seq((1L, mp4v0)).toDF("doc_id", "payload")
      .select(Multimodal.sniffFormat(col("payload"))).head().getString(0)
    assert(sniffed == "mp4")
  }

  test("GIF/TIFF/WebP: both sniffers + codec-free header metadata, " +
    "hostile inputs bounded to None") {
    import Multimodal.{Decoder, ImageContainerMeta}
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // GIF89a, 320x200, GCT flag + size bits 001 => 2-bit table depth
    val gif1 = "GIF89a".getBytes("US-ASCII") ++ le16(320) ++ le16(200) ++
      Array[Byte](0x91.toByte, 0, 0)
    // TIFF IFD0 with ImageWidth (SHORT), ImageLength (LONG), BitsPerSample
    def tiffEntryLE(tag: Int, typ: Int, v: Long) = le16(tag) ++ le16(typ) ++
      le32(1) ++ (if (typ == 3) le16(v.toInt) ++ le16(0) else le32(v))
    val tiffLE = "II".getBytes ++ Array[Byte](0x2a, 0) ++ le32(8) ++
      le16(3) ++ tiffEntryLE(256, 3, 640) ++ tiffEntryLE(257, 4, 480) ++
      tiffEntryLE(258, 3, 8) ++ le32(0)
    def tiffEntryBE(tag: Int, typ: Int, v: Long) = be16(tag) ++ be16(typ) ++
      be32(1) ++ (if (typ == 3) be16(v.toInt) ++ be16(0) else be32(v))
    val tiffBE = "MM".getBytes ++ Array[Byte](0, 0x2a) ++ be32(8) ++
      be16(2) ++ tiffEntryBE(256, 4, 1920) ++ tiffEntryBE(257, 3, 1080) ++
      be32(0)
    // WebP: all three flavors (VP8 keyframe start code, VP8L packed
    // 14-bit dims + alpha bit, VP8X 24-bit canvas + alpha flag)
    def riffWebp(chunk: String, body: Array[Byte]) =
      "RIFF".getBytes ++ le32(4L + 8L + body.length) ++ "WEBP".getBytes ++
        chunk.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    val vp8 = riffWebp("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01,
      0x2a) ++ le16(640) ++ le16(360))
    val vp8l = riffWebp("VP8L", Array[Byte](0x2f, 0x63, 0x40, 0x0c, 0x10))
    val vp8x = riffWebp("VP8X", Array[Byte](0x10, 0, 0, 0) ++
      Array[Byte](0xff.toByte, 0x03, 0x00) ++
      Array[Byte](0xff.toByte, 0x02, 0x00) ++ Array[Byte](0, 0))
    // header parses: exact field-level expectations
    assert(Decoder.parseGifMeta(1L, gif1).contains(
      ImageContainerMeta(1L, "gif", "89a", 320, 200, 2, has_alpha = false)))
    assert(Decoder.parseTiffMeta(2L, tiffLE).contains(
      ImageContainerMeta(2L, "tiff", "II", 640, 480, 8, has_alpha = false)))
    assert(Decoder.parseTiffMeta(3L, tiffBE).contains(
      ImageContainerMeta(3L, "tiff", "MM", 1920, 1080, 0,
        has_alpha = false)))
    assert(Decoder.parseWebPMeta(4L, vp8).contains(
      ImageContainerMeta(4L, "webp", "VP8", 640, 360, 8,
        has_alpha = false)))
    assert(Decoder.parseWebPMeta(5L, vp8l).contains(
      ImageContainerMeta(5L, "webp", "VP8L", 100, 50, 8, has_alpha = true)))
    assert(Decoder.parseWebPMeta(6L, vp8x).contains(
      ImageContainerMeta(6L, "webp", "VP8X", 1024, 768, 8,
        has_alpha = true)))
    // both sniffers agree, and WebP wins over generic riff while a WAV
    // payload still sniffs riff
    val wavish = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes
    for ((p, want) <- Seq(gif1 -> "gif", tiffLE -> "tiff", tiffBE -> "tiff",
        vp8 -> "webp", vp8l -> "webp", vp8x -> "webp", wavish -> "riff")) {
      assert(Decoder.sniffOne(p) == want, s"sniffOne: want $want")
      val colForm = Seq((0L, p)).toDF("id", "payload")
        .select(Multimodal.sniffFormat(col("payload"))).head().getString(0)
      assert(colForm == want, s"sniffFormat: want $want got $colForm")
    }
    // Dataset branch: dispatches the three, drops everything else
    val df = Seq((1L, gif1), (2L, tiffLE), (4L, vp8),
      (9L, "not an image".getBytes)).toDF("doc_id", "payload")
    val got = Decoder.decodeImageContainers(df).collect()
      .map(m => m.doc_id -> m.format).toMap
    assert(got == Map(1L -> "gif", 2L -> "tiff", 4L -> "webp"))
    // hostile vectors: truncation, out-of-range IFD, entry overrun,
    // missing start code — None, never a throw or a hang
    assert(Decoder.parseGifMeta(1L, "GIF89a".getBytes).isEmpty)
    assert(Decoder.parseGifMeta(1L, "GIF99a00000000".getBytes).isEmpty)
    assert(Decoder.parseTiffMeta(1L,
      "II".getBytes ++ Array[Byte](0x2a, 0) ++ le32(0xfffffff0L)).isEmpty)
    assert(Decoder.parseTiffMeta(1L, "II".getBytes ++
      Array[Byte](0x2a, 0) ++ le32(8) ++ le16(400)).isEmpty)
    assert(Decoder.parseWebPMeta(1L,
      riffWebp("VP8 ", Array[Byte](0, 0, 0, 1, 2, 3) ++ le16(640) ++
        le16(360))).isEmpty)
    assert(Decoder.parseWebPMeta(1L, wavish).isEmpty)
  }

  test("decodeOne: GIF/TIFF take the real imageio path, WebP dims come " +
    "from the header parse") {
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)
    for (fmt <- Seq("gif", "tiff")) {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos),
        s"JDK must carry a $fmt writer")
      val m = Multimodal.Decoder.decodeOne(11L, baos.toByteArray)
      assert(m.format == fmt && m.width == 6 && m.height == 4,
        s"$fmt: $m")
    }
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val body = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le16(320) ++ le16(240)
    val webp = "RIFF".getBytes ++ le32(4L + 8L + body.length) ++
      "WEBP".getBytes ++ "VP8 ".getBytes ++ le32(body.length.toLong) ++ body
    val m = Multimodal.Decoder.decodeOne(12L, webp)
    assert(m.format == "webp" && m.width == 320 && m.height == 240 &&
      m.channels == 3, m.toString)
    // features stay the real byte histogram (mass == payload length)
    assert(m.features.sum == webp.length.toLong)
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

  test("PNG IHDR / JPEG SOF hostile vectors: truncation, wrong first " +
    "chunk, missing SOF, standalone markers, zero dims -> None, " +
    "valid headers parse field-exactly") {
    import Multimodal.Decoder.{parseJpegMeta, parsePngMeta}
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a)
    val ihdr = be32(13) ++ "IHDR".getBytes ++ be32(320) ++ be32(200) ++
      Array[Byte](16, 4, 0, 0, 0) ++ be32(0)
    val png = sig ++ ihdr
    val m = parsePngMeta(1L, png).get
    assert(m == Multimodal.ImageContainerMeta(1L, "png", "gray+a",
      320, 200, 16, has_alpha = true))
    assert(parsePngMeta(1L, png.take(32)).isEmpty)   // one byte short
    val wrongChunk = sig ++ be32(13) ++ "IDAT".getBytes ++ png.drop(16)
    assert(parsePngMeta(1L, wrongChunk).isEmpty)
    val zeroW = sig ++ be32(13) ++ "IHDR".getBytes ++ be32(0) ++
      be32(200) ++ Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    assert(parsePngMeta(1L, zeroW).isEmpty)
    val badColor = sig ++ be32(13) ++ "IHDR".getBytes ++ be32(1) ++
      be32(1) ++ Array[Byte](8, 7, 0, 0, 0) ++ be32(0)
    assert(parsePngMeta(1L, badColor).isEmpty)

    val soi = Array[Byte](0xFF.toByte, 0xD8.toByte)
    def seg(marker: Int, body: Array[Byte]) =
      Array[Byte](0xFF.toByte, marker.toByte,
        ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xff).toByte
      ) ++ body
    val sof2 = seg(0xC2, Array[Byte](12) ++ Array[Byte](1, 44) ++
      Array[Byte](2, 88) ++ Array[Byte](1, 1, 0x11, 0))
    // a progressive SOF behind an APP0, a comment, AND a standalone
    // restart marker — the walk must skip all three
    val jpeg = soi ++ seg(0xE0, new Array[Byte](4)) ++
      seg(0xFE, "comment".getBytes) ++ Array[Byte](0xFF.toByte, 0x01) ++
      sof2
    val j = parseJpegMeta(1L, jpeg).get
    assert(j == Multimodal.ImageContainerMeta(1L, "jpeg", "SOF2",
      600, 300, 12, has_alpha = false))
    // EOI before any SOF
    assert(parseJpegMeta(1L,
      soi ++ Array[Byte](0xFF.toByte, 0xD9.toByte)).isEmpty)
    // scan start before any SOF
    assert(parseJpegMeta(1L,
      soi ++ seg(0xDA, Array[Byte](1, 1, 0))).isEmpty)
    // truncated mid-segment
    assert(parseJpegMeta(1L, jpeg.dropRight(3)).isEmpty)
    // zero dims
    val zeroSof = soi ++ seg(0xC0, Array[Byte](8, 0, 0, 0, 1, 1, 1,
      0x11, 0))
    assert(parseJpegMeta(1L, zeroSof).isEmpty)
  }
  test("frameSamplePlan: midpoint timestamps are exact, zero and " +
    "overflow durations drop, columns pass through, k is guarded") {
    val meta = Seq(
      (1L, 8000000L, "isom"),            // 8s -> midpoints at 1,3,5,7s
      (2L, 0L, "zero"),                  // no frames
      (3L, Long.MaxValue / 4L, "huge")   // 2k=8 multiply would overflow
    ).toDF("doc_id", "duration_us", "brand")
    val got = Multimodal.frameSamplePlan(meta, 4)
      .select("doc_id", "brand", "frame_no", "ts_us")
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(got.map(_._1).distinct.toSeq == Seq(1L))
    assert(got.map(_._4).toSeq ==
      Seq(1000000L, 3000000L, 5000000L, 7000000L), got.toSeq.toString)
    assert(got.forall(_._2 == "isom")) // passthrough
    intercept[IllegalArgumentException] {
      Multimodal.frameSamplePlan(meta, 0)
    }
  }
  test("segmentPlan: full coverage with overlap, truncated final " +
    "window, zero-duration drop, guards") {
    val meta = Seq((1L, 1000000L), (2L, 0L)).toDF("doc_id", "duration_us")
    val got = Multimodal.segmentPlan(meta, windowUs = 400000L,
        overlapUs = 100000L)
      .select("doc_id", "seg_no", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    // hop 300000 over 1s: starts 0,300k,600k,900k; last truncates
    assert(got == Seq(
      (1L, 0L, 0L, 400000L), (1L, 1L, 300000L, 700000L),
      (1L, 2L, 600000L, 1000000L), (1L, 3L, 900000L, 1000000L)),
      got.toString)
    // every instant covered: consecutive windows overlap by 100k
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 < a._4); case _ => }
    intercept[IllegalArgumentException] {
      Multimodal.segmentPlan(meta, 100L, 100L) // overlap must be < window
    }
  }
}
