package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic mutation fuzz over the codec-free container parsers
  * (WAV / MP3 / FLAC / MP4 / GIF / TIFF / WebP): seeded xor, truncate,
  * extend, and 4-byte-splice mutations of VALID fixtures, ~10k cases
  * per format. The contract under hostile bytes is parse-or-None —
  * never a throw, never a hang, and when a mutant still parses, never
  * a negative dimension/rate/count (a mutant that flips a benign field
  * may legitimately still be Some).
  *
  * Driver-side only on purpose: the parsers are plain functions (the
  * Spark pipeline wraps them in mapPartitions), so the fuzz loop runs
  * 70k cases in-process in a couple of seconds without 70k task
  * launches — the distributed path is covered by the decode specs.
  */
class MultimodalFuzzSpec extends AnyFunSuite {
  import Multimodal.Decoder._

  private def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long) = Array[Byte]((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(t: String, body: Array[Byte]) =
    be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body

  // one VALID fixture per format (mirrors the happy-path specs)
  private val wavFix: Array[Byte] = {
    val data = Array.fill[Byte](64)(7)
    "RIFF".getBytes ++ le32(36L + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000L) ++
      le32(32000L) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length.toLong) ++ data
  }
  private val mp3Fix: Array[Byte] =
    Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x40) ++
      Array.fill[Byte](128)(3)
  private val flacFix: Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = 0x0B; si(11) = 0xB8.toByte; si(12) = 0x02; si(13) = 0xF0.toByte
    si(15) = 0x01; si(16) = 0x77
    "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ si
  }
  private val mp4Fix: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "mp42".getBytes)
    val mvhd = box("mvhd", new Array[Byte](4) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(5000) ++ new Array[Byte](80))
    ftyp ++ box("moov", mvhd ++ box("trak", Array[Byte]()))
  }
  private val gifFix: Array[Byte] =
    "GIF89a".getBytes ++ le16(320) ++ le16(200) ++
      Array[Byte](0x91.toByte, 0, 0) ++ Array.fill[Byte](16)(5)
  private val tiffFix: Array[Byte] =
    "II".getBytes ++ le16(42) ++ le32(8L) ++ le16(2) ++
      (le16(256) ++ le16(3) ++ le32(1L) ++ le16(320) ++ le16(0)) ++
      (le16(257) ++ le16(3) ++ le32(1L) ++ le16(200) ++ le16(0)) ++
      le32(0L)
  private val webpFix: Array[Byte] = {
    val vp8x = Array[Byte](0x10, 0, 0, 0) ++
      Array[Byte](63, 1, 0) ++ Array[Byte]((199 & 0xff).toByte, 0, 0)
    "RIFF".getBytes ++ le32(12L + 10) ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ le32(10L) ++ vp8x
  }

  private val pngFix: Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(320) ++ be32(200) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0)
  private val jpegFix: Array[Byte] =
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 4, 0, 0) ++
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 0x11, 8) ++
      Array[Byte](0, 200.toByte) ++ Array[Byte](1, 64) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)

  private type Parser = Array[Byte] => Option[Any]
  private val parsers: Seq[(String, Array[Byte], Parser)] = Seq(
    ("wav", wavFix, p => parseWavMeta(1L, p)),
    ("mp3", mp3Fix, p => parseMp3Meta(1L, p)),
    ("flac", flacFix, p => parseFlacMeta(1L, p)),
    ("mp4", mp4Fix, p => parseMp4Meta(1L, p)),
    ("gif", gifFix, p => parseGifMeta(1L, p)),
    ("tiff", tiffFix, p => parseTiffMeta(1L, p)),
    ("webp", webpFix, p => parseWebPMeta(1L, p)),
    ("png", pngFix, p => parsePngMeta(1L, p)),
    ("jpeg", jpegFix, p => parseJpegMeta(1L, p)))

  /** Parsed-field sanity under mutation: whatever survives must carry
    * non-negative physical quantities. */
  private def sane(m: Any): Seq[(String, Long)] = m match {
    case w: Multimodal.WavMeta => Seq(
      "channels" -> w.channels.toLong, "sample_rate" -> w.sample_rate.toLong,
      "bits" -> w.bits_per_sample.toLong, "n_frames" -> w.n_frames,
      "duration_us" -> w.duration_us)
    case a: Multimodal.AudioMeta => Seq(
      "channels" -> a.channels.toLong, "sample_rate" -> a.sample_rate.toLong,
      "bits" -> a.bits_per_sample.toLong, "n_frames" -> a.n_frames,
      "duration_us" -> a.duration_us, "bitrate" -> a.bitrate_kbps.toLong)
    case v: Multimodal.VideoMeta => Seq(
      "timescale" -> v.timescale, "duration_units" -> v.duration_units,
      "duration_us" -> v.duration_us, "n_tracks" -> v.n_tracks.toLong)
    case i: Multimodal.ImageContainerMeta => Seq(
      "width" -> i.width.toLong, "height" -> i.height.toLong,
      "depth_bits" -> i.depth_bits.toLong)
    case other => fail(s"unexpected meta type: $other")
  }

  test("10k seeded mutants per format: parse-or-None, no throw, no " +
    "negative field; sniffOne never throws either") {
    val cases = 10000
    for ((name, fix, parse) <- parsers) {
      // fixed seed per format: failures reproduce exactly
      val rnd = new scala.util.Random(0x5EED0000L + name.hashCode)
      var parsed = 0
      var i = 0
      while (i < cases) {
        val p = fix.clone()
        val mutant: Array[Byte] = rnd.nextInt(5) match {
          case 0 => // xor one byte
            val o = rnd.nextInt(p.length)
            p(o) = (p(o) ^ (1 << rnd.nextInt(8))).toByte; p
          case 1 => // truncate
            p.take(rnd.nextInt(p.length + 1))
          case 2 => // extend with junk
            p ++ Array.fill[Byte](1 + rnd.nextInt(32))(rnd.nextInt().toByte)
          case 3 => // splice a hostile 4-byte window (size/offset fields)
            val o = rnd.nextInt(math.max(1, p.length - 4))
            val v = rnd.nextInt(4) match {
              case 0 => 0L
              case 1 => 0xffffffffL      // -1 / u32 max
              case 2 => 0x80000000L      // sign-flip boundary
              case _ => rnd.nextLong() & 0xffffffffL
            }
            System.arraycopy(le32(v), 0, p, o, 4); p
          case _ => // double mutation: xor + truncate
            val o = rnd.nextInt(p.length)
            p(o) = (p(o) ^ 0xff).toByte
            p.take(1 + rnd.nextInt(p.length))
        }
        val got = try parse(mutant) catch {
          case e: Throwable =>
            fail(s"$name parser threw on mutant #$i " +
              s"(${mutant.length} B, seed-deterministic): $e")
        }
        got.foreach { m =>
          parsed += 1
          sane(m).foreach { case (f, v) =>
            assert(v >= 0L,
              s"$name mutant #$i parsed with negative $f=$v")
          }
        }
        // empty/garbage must also be safe for the sniffer
        if (i % 1000 == 0) sniffOne(mutant)
        i += 1
      }
      // the fuzz must exercise the Some path too, not just reject all:
      // single-bit xors away from header-critical bytes still parse
      assert(parsed > 0, s"$name: no mutant parsed — fixture wrong?")
    }
    // degenerate payloads across every parser
    val degenerate = Seq(Array.emptyByteArray, Array[Byte](0),
      Array.fill[Byte](3)(-1), "RIFF".getBytes, "fLaC".getBytes,
      "GIF8".getBytes, "II".getBytes ++ le16(42))
    for ((name, _, parse) <- parsers; d <- degenerate) {
      try parse(d) catch {
        case e: Throwable => fail(s"$name threw on degenerate input: $e")
      }
      sniffOne(d)
    }
  }
}
