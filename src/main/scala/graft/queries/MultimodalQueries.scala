package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing over a synthesized binary payload (the
  * container ships no codecs — the payload is the document's utf-8 bytes
  * standing in for an image/audio blob; every Spark-side mechanism is
  * real: binary columns, content addressing, frame sampling, format
  * sniffing. The typed mapPartitions decode pipeline is covered in
  * MultimodalSpec.)
  */
object MultimodalQueries {

  /** Hex of one byte (two lowercase digits) of an integral column. */
  private def hexByte(c: org.apache.spark.sql.Column) =
    lpad(lower(hex(c.cast("long"))), 2, "0")
  /** Little-endian u16 / u24 hex of an integral column. */
  private def u16le(c: org.apache.spark.sql.Column) =
    concat(hexByte(c % 256), hexByte((c.cast("long") / 256).cast("long")))
  private def u24le(c: org.apache.spark.sql.Column) =
    concat(hexByte(c % 256),
      hexByte((c.cast("long") / 256).cast("long") % 256),
      hexByte((c.cast("long") / 65536).cast("long")))
  /** Big-endian u16 / u32 hex (PNG/JPEG dimension fields). */
  private def u16be(c: org.apache.spark.sql.Column) =
    concat(hexByte((c.cast("long") / 256).cast("long")),
      hexByte(c % 256))
  private def u32be(c: org.apache.spark.sql.Column) =
    concat(lit("0000"), u16be(c))

  /** The mm_png_jpeg_meta / mm_interleaved_plan / pipeline_vlm_shards
    * fixture payload: a REAL PNG IHDR (even doc_ids) or JPEG SOF0
    * (odd) header with doc_id-derived dimensions — ONE definition so
    * the graded queries can never diverge on the byte layout. */
  private[queries] def pngJpegPayload: org.apache.spark.sql.Column = {
    val w = col("doc_id") % 200 + 1
    val h = col("doc_id") % 100 + 1
    val colorType = when(col("doc_id") % 4 === 0, lit("06"))
      .otherwise(lit("02"))
    val pngHex = concat(lit("89504e470d0a1a0a"), lit("0000000d"),
      lit("49484452"), u32be(w), u32be(h), lit("08"), colorType,
      lit("000000"), lit("00000000"))
    val jpegHex = concat(lit("ffd8"), lit("ffe0"), lit("0004"),
      lit("0000"), lit("ffc0"), lit("0011"), lit("08"), u16be(h),
      u16be(w), lit("03"), lit("011100"), lit("021101"),
      lit("031101"), lit("ffd9"))
    unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpegHex))
  }

  val defs: Seq[QueryDef] = Seq(

    // END-TO-END grade of the codec-free container parsers: every doc
    // synthesizes a REAL binary header (GIF89a / TIFF-II IFD0 / WebP
    // VP8X by doc_id mod 3, dimensions derived from doc_id), the typed
    // mapPartitions branch parses the BYTES back, and the oracle
    // recomputes the expected metadata from doc_id arithmetic alone —
    // so a single mis-parsed field (endianness, off-by-one window,
    // flag bit) hash-mismatches. This promotes the GIF/TIFF/WebP
    // family from spec-only to oracle-graded, the same promotion
    // mm_format_dispatch gave the sniffer.
    QueryDef("mm_container_meta",
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'gif'
        |       WHEN 1 THEN 'tiff' ELSE 'webp' END AS format,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '89a'
        |       WHEN 1 THEN 'II' ELSE 'VP8X' END AS variant,
        |  CAST(doc_id % 200 + 1 AS INT) AS width,
        |  CAST(doc_id % 100 + 1 AS INT) AS height,
        |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 2
        |       WHEN 1 THEN 0 ELSE 8 END AS INT) AS depth_bits,
        |  doc_id % 3 = 2 AS has_alpha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val w = col("doc_id") % 200 + 1
      val h = col("doc_id") % 100 + 1
      // GIF89a: magic + LE dims + packed 0x91 (GCT, 2-bit) + bg + aspect
      val gifHex = concat(lit("474946383961"), u16le(w), u16le(h),
        lit("910000"))
      // TIFF II: magic + IFD@8 + 2 entries (256/257 SHORT inline) + end
      def tiffEntry(tag: String, v: org.apache.spark.sql.Column) =
        concat(lit(tag), lit("0300"), lit("01000000"), u16le(v),
          lit("0000"))
      val tiffHex = concat(lit("49492a00"), lit("08000000"), lit("0200"),
        tiffEntry("0001", w), tiffEntry("0101", h), lit("00000000"))
      // WebP VP8X: RIFF size 22 + WEBP + VP8X chunk (10 B): alpha flag,
      // 3 reserved, 24-bit canvas-1 dims
      val webpHex = concat(lit("52494646"), lit("16000000"),
        lit("57454250"), lit("56503858"), lit("0a000000"),
        lit("10"), lit("000000"), u24le(w - 1), u24le(h - 1))
      val payload = unhex(
        when(col("doc_id") % 3 === 0, gifHex)
          .when(col("doc_id") % 3 === 1, tiffHex)
          .otherwise(webpHex))
      Multimodal.Decoder.decodeImageContainers(
          Tables.documents(s, d).select(col("doc_id"),
            payload.as("payload")))
        .toDF()
        .select(col("doc_id"), col("format"), col("variant"),
          col("width"), col("height"), col("depth_bits"),
          col("has_alpha"))
        .orderBy("doc_id")
    },

    // Frame-sampling PLAN graded through the REAL container parser:
    // every doc synthesizes a walkable ISO BMFF tree in-plan (ftyp +
    // moov holding an mvhd v0 with arithmetic-derived duration and
    // doc_id%3+1 empty trak boxes), decodeVideo walks the BYTES back,
    // and frameSamplePlan emits 4 midpoint-uniform seek timestamps —
    // the oracle recomputes tracks, microsecond duration, and every
    // ts_us from doc_id arithmetic, so a box-walk slip, a timescale
    // mix-up, or a midpoint off-by-one hash-mismatches.
    QueryDef("mm_frame_plan",
      """WITH v AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 3 + 1 AS INT) AS n_tracks,
        |    CAST((doc_id % 9000 + 1000) * 1000 AS BIGINT)
        |      AS duration_us
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_tracks, duration_us,
        |    CAST(unnest(range(0, 4)) AS BIGINT) AS frame_no
        |  FROM v)
        |SELECT doc_id, n_tracks, duration_us, frame_no,
        |  (duration_us * (2 * frame_no + 1)) // 8 AS ts_us
        |FROM f ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
      def be32(v: org.apache.spark.sql.Column) =
        lpad(hex(v.cast("long")), 8, "0")
      val dur = col("doc_id") % 9000 + 1000
      // ftyp(isom) + moov[ mvhd v0 (timescale 1000, duration dur) +
      // (doc_id%3+1) empty trak boxes ]
      val mvhd = concat(
        lit("0000001c6d766864" + "00000000" + "00000000" + "00000000"),
        be32(lit(1000L)), be32(dur))
      val hexStr = concat(
        lit("00000010" + "66747970" + "69736f6d" + "00000200"),
        be32(lit(36L) + (col("doc_id") % 3 + 1) * 8L),
        lit("6d6f6f76"), mvhd,
        expr("repeat('000000087472616b', CAST(doc_id % 3 + 1 AS INT))"))
      val meta = Multimodal.Decoder.decodeVideo(
          Tables.documents(s, d).select(col("doc_id"),
            unhex(hexStr).as("payload")))
        .toDF()
      Multimodal.frameSamplePlan(meta, 4)
        .select(col("doc_id"), col("n_tracks"), col("duration_us"),
          col("frame_no"), col("ts_us"))
        .orderBy("doc_id", "frame_no")
    },

    // Audio segmentation plan graded through the REAL RIFF chunk walk:
    // every doc synthesizes a complete PCM WAV in-plan (fmt chunk at
    // 50 Hz mono 16-bit, a physically-present data chunk sized by
    // doc_id arithmetic — the parser clamps declared size to actual
    // bytes, so the bytes must exist), decodeWav reads frames and
    // microsecond duration back, and segmentPlan windows the stream
    // (0.5 s windows, 0.1 s overlap). The oracle recomputes frames,
    // duration, segment count, and every window edge — including the
    // truncated final window — from arithmetic.
    QueryDef("mm_segment_plan",
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 100 + 50 AS BIGINT) AS n_frames
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_frames,
        |    CAST(n_frames * 20000 AS BIGINT) AS duration_us
        |  FROM a),
        |s AS (
        |  SELECT doc_id, n_frames, duration_us,
        |    CAST(unnest(range(0, (duration_us - 1) // 400000 + 1))
        |      AS BIGINT) AS seg_no
        |  FROM m)
        |SELECT doc_id, n_frames, duration_us, seg_no,
        |  seg_no * 400000 AS start_us,
        |  least(seg_no * 400000 + 500000, duration_us) AS end_us
        |FROM s ORDER BY doc_id, seg_no""".stripMargin) { (s, d) =>
      val frames = col("doc_id") % 100 + 50
      val dataBytes = frames * 2 // mono 16-bit: blockAlign 2
      val hexStr = concat(
        lit("52494646" + "00000000" + "57415645"), // RIFF + WAVE
        lit("666d7420" + "10000000" + "0100" + "0100"), // fmt: PCM mono
        lit("32000000"), // rate 50 Hz (LE)
        lit("64000000"), // byte rate 100 (LE)
        lit("0200" + "1000"), // block align 2, bits 16
        lit("64617461"), u16le(dataBytes), lit("0000"), // data size LE
        expr(s"repeat('00', CAST(${"doc_id % 100 + 50"} AS INT) * 2)"))
      val meta = Multimodal.Decoder.decodeWav(
          Tables.documents(s, d).select(col("doc_id"),
            unhex(hexStr).as("payload")))
        .toDF()
      Multimodal.segmentPlan(meta, windowUs = 500000L,
          overlapUs = 100000L)
        .select(col("doc_id"), col("n_frames"), col("duration_us"),
          col("seg_no"), col("start_us"), col("end_us"))
        .orderBy("doc_id", "seg_no")
    },

    // Gzip member-header metadata graded the mm_container_meta way:
    // every doc synthesizes a REAL RFC 1952 header (FNAME flag, LE
    // mtime from doc_id arithmetic, xfl/os constants, zero-terminated
    // original name, trailing junk standing in for the deflate
    // stream), the archive-inventory parser reads the BYTES back, and
    // the oracle recomputes the fields from arithmetic — an
    // endianness slip, a mis-skipped optional field, or an off-by-one
    // name window hash-mismatches. The inflate path is graded
    // separately by text_wet_gz_extract; this is the inventory scan
    // that never inflates.
    QueryDef("mm_gzip_meta",
      """SELECT doc_id, CAST(8 AS INT) AS method,
        |  CAST(doc_id * 7 + 123456 AS BIGINT) AS mtime,
        |  CAST(2 AS INT) AS xfl, CAST(3 AS INT) AS os,
        |  'f' || CAST(doc_id AS VARCHAR) || '.wet' AS fname
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val mt = col("doc_id") * 7 + 123456
      val mtHi = expr("CAST((doc_id * 7 + 123456) div 65536 AS BIGINT)")
      val headHex = concat(lit("1f8b0808"), u16le(mt % 65536),
        u16le(mtHi), lit("0203"))
      val payload = concat(unhex(headHex),
        encode(concat(lit("f"), col("doc_id").cast("string"),
          lit(".wet")), "UTF-8"),
        unhex(lit("00")), unhex(lit("abcd")))
      graft.ext.Warc.gzipMeta(
          Tables.documents(s, d).select(col("doc_id"),
            payload.as("payload")), idCol = "doc_id")
        .toDF()
        .select(col("blob_id").as("doc_id"), col("method"),
          col("mtime"), col("xfl"), col("os"), col("fname"))
        .orderBy("doc_id")
    },

    // PNG IHDR / JPEG SOF parsers graded the mm_container_meta way:
    // even docs synthesize a real 33-byte PNG signature+IHDR (color
    // type rgba/rgb by doc_id mod 4), odd docs a minimal JPEG with an
    // APP0 to walk over, an SOF0 frame header, and an EOI — the typed
    // mapPartitions branch parses the BYTES back and the oracle
    // recomputes the expectations from doc_id arithmetic alone, so an
    // endianness slip, a mis-walked marker, or a wrong color-type map
    // hash-mismatches.
    QueryDef("mm_png_jpeg_meta",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN
        |    (CASE WHEN doc_id % 4 = 0 THEN 'rgba' ELSE 'rgb' END)
        |  ELSE 'SOF0' END AS variant,
        |  CAST(doc_id % 200 + 1 AS INT) AS width,
        |  CAST(doc_id % 100 + 1 AS INT) AS height,
        |  CAST(8 AS INT) AS depth_bits,
        |  doc_id % 2 = 0 AND doc_id % 4 = 0 AS has_alpha
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val payload = pngJpegPayload
      Multimodal.Decoder.decodeImageContainers(
          Tables.documents(s, d).select(col("doc_id"),
            payload.as("payload")))
        .toDF()
        .select(col("doc_id"), col("format"), col("variant"),
          col("width"), col("height"), col("depth_bits"),
          col("has_alpha"))
        .orderBy("doc_id")
    },

    QueryDef("mm_payload_meta",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  sha256(text) AS content_sha,
        |  substring(hex(encode(text)), 1, 16) AS frame_0,
        |  substring(hex(encode(text)), 65, 16) AS frame_1,
        |  substring(hex(encode(text)), 129, 16) AS frame_2,
        |  substring(hex(encode(text)), 193, 16) AS frame_3
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payload = col("text").cast("binary")
      Tables.documents(s, d).select(
        col("doc_id"),
        Multimodal.byteLen(payload).as("byte_len"),
        Multimodal.contentAddress(payload).as("content_sha"),
        Multimodal.sampleFrameHex(payload, 0, 32, 8).as("frame_0"),
        Multimodal.sampleFrameHex(payload, 1, 32, 8).as("frame_1"),
        Multimodal.sampleFrameHex(payload, 2, 32, 8).as("frame_2"),
        Multimodal.sampleFrameHex(payload, 3, 32, 8).as("frame_3"))
        .orderBy("doc_id")
    },

    // INTERLEAVED image-text sequence plan — the VLM data-prep step:
    // each document contributes its text tokens plus a patch-grid
    // budget for its image (ViT-style ceil(w/14)*ceil(h/14), parsed
    // from the REAL container header by the binary decoder — the
    // oracle replays the synthesis arithmetic, the Spark side must
    // get the dims back out of the bytes), plus BOS and image
    // separator; sequences then pack into 4096-token context windows
    // through the range-partitioned prefix sum. Graded per document:
    // both modality budgets, the interleaved length, and the window
    // assignment — a wrong patch ceiling, a dim mis-parse or an
    // off-by-one at any window boundary flips the hash.
    QueryDef("mm_interleaved_plan",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(coalesce(len(list_filter(string_split(text, ' '),
        |      v -> length(v) > 0)), 0) AS BIGINT) AS n_text_tokens,
        |    CAST(((doc_id % 200 + 1 + 13) // 14)
        |      * ((doc_id % 100 + 1 + 13) // 14) AS BIGINT) AS n_patches
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_text_tokens, n_patches,
        |    CAST(n_text_tokens + n_patches + 2 AS BIGINT) AS seq_len
        |  FROM m),
        |rr AS (
        |  SELECT doc_id, n_text_tokens, n_patches, seq_len,
        |    CAST(SUM(seq_len) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - seq_len AS BIGINT) AS start_offset
        |  FROM q)
        |SELECT doc_id, n_text_tokens, n_patches, seq_len, start_offset,
        |  CAST(start_offset // 4096 AS BIGINT) AS bin
        |FROM rr ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val payload = pngJpegPayload
      // the dims come back OUT of the bytes via the real parser
      val dims = Multimodal.Decoder.decodeImageContainers(
          docs.select(col("doc_id"), payload.as("payload")))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"))
      val txt = docs.select(col("doc_id"),
        coalesce(size(filter(graft.ext.TextAnalysis.tokens(col("text")),
          v => length(v) > 0)), lit(0)).cast("long")
          .as("n_text_tokens"))
      val m = txt.join(dims, Seq("doc_id"))
        .withColumn("n_patches",
          (expr("(width + 13) div 14") * expr("(height + 13) div 14"))
            .cast("long"))
        .withColumn("seq_len",
          col("n_text_tokens") + col("n_patches") + lit(2L))
      graft.ops.PrefixSum.packIntoBins(m, weight = col("seq_len"),
          budget = 4096L, orderBy = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_text_tokens"), col("n_patches"),
          col("seq_len"), col("start_offset"),
          col("bin").cast("long").as("bin"))
        .orderBy("doc_id")
    },

    // modality dispatch: format sniff + per-format counts (the payloads
    // are all text => 'unknown'; the dispatch expression is the operator)
    QueryDef("mm_format_dispatch",
      """SELECT CASE
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '89504E47%' THEN 'png'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE 'FFD8FF%' THEN 'jpeg'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '47494638%' THEN 'gif'
        |    WHEN substring(hex(encode(text)), 1, 8) IN ('49492A00', '4D4D002A')
        |      THEN 'tiff'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '52494646%'
        |      AND substring(hex(encode(text)), 17, 8) = '57454250' THEN 'webp'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '52494646%' THEN 'riff'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '664C6143%' THEN 'flac'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '494433%' THEN 'mp3'
        |    WHEN substring(hex(encode(text)), 1, 3) IN ('FFE', 'FFF') THEN 'mp3'
        |    WHEN substring(hex(encode(text)), 9, 8) = '66747970' THEN 'mp4'
        |    ELSE 'unknown' END AS format,
        |  COUNT(*) AS n,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(Multimodal.sniffFormat(col("text").cast("binary"))
          .as("format"))
        .agg(count(lit(1)).as("n"),
          sum(Multimodal.byteLen(col("text").cast("binary")))
            .cast("bigint").as("total_bytes"))
        .orderBy("format")
    },

    // the partition-batched decode pipeline, oracle-verified end to end:
    // text payloads dispatch to the stub fallback whose FEATURE step
    // (16-bin byte histogram) is real computation over the payload, so
    // the typed mapPartitions Dataset path — the Scala analog of
    // mapInPandas — gets a DuckDB check, not just a spec. (Corpus is
    // ASCII: byte == codepoint. Real PNG/JPEG payloads take the imageio
    // decode path, covered by MultimodalSpec.)
    QueryDef("mm_histogram",
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |         i -> ord(substring(text, i, 1)))) AS byte
        |  FROM documents)
        |SELECT doc_id, CAST(byte // 16 AS BIGINT) AS bin, COUNT(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY doc_id, bin""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.Decoder.decode(docs, "doc_id", "payload")
        .select(col("doc_id"), posexplode(col("features")))
        .withColumnsRenamed(Map("pos" -> "bin", "col" -> "n"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("bin").cast("long"), col("n"))
        .orderBy("doc_id", "bin")
    },

    // perceptual-hash near-duplicate pairs over the decode pipeline:
    // 64-bit positional pHash emitted as 4×16-bit bands, LSH candidate
    // join on band equality (pigeonhole: hamming <= 3 across 4 bands
    // forces at least one equal band — zero false negatives), exact
    // hamming verify on candidates only. The image-dedup shape: at
    // corpus scale the pairwise space never materializes, only band
    // collisions do. Real PNG/JPEG payloads hash an 8x8 pooled
    // luminance grid (MultimodalSpec); the ASCII corpus takes the
    // 1-D stub path, which the oracle replays integer-for-integer.
    QueryDef("mm_phash_pairs",
      """WITH b AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    unnest(range(0, length(text))) AS j
        |  FROM documents),
        |bv AS (
        |  SELECT doc_id, ord(substring(text, j + 1, 1)) AS byte,
        |    (j * 64) // len AS bkt
        |  FROM b),
        |bs AS (SELECT doc_id, bkt, SUM(byte) AS s FROM bv GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(s) AS total FROM bs GROUP BY 1),
        |bits AS (
        |  SELECT bs.doc_id, bs.bkt // 16 AS band, bs.bkt % 16 AS pos,
        |    CASE WHEN bs.s * 64 >= tot.total THEN 1 ELSE 0 END AS bit
        |  FROM bs JOIN tot ON tot.doc_id = bs.doc_id),
        |bands AS (
        |  SELECT doc_id, band, CAST(SUM(bit * (1 << pos)) AS BIGINT) AS bv
        |  FROM bits GROUP BY 1, 2),
        |wide AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN band = 0 THEN bv END) AS b0,
        |    MAX(CASE WHEN band = 1 THEN bv END) AS b1,
        |    MAX(CASE WHEN band = 2 THEN bv END) AS b2,
        |    MAX(CASE WHEN band = 3 THEN bv END) AS b3
        |  FROM bands GROUP BY 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
        |      AS BIGINT) AS hamming
        |  FROM wide a JOIN wide b ON a.doc_id < b.doc_id
        |    AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2
        |         OR a.b3 = b.b3))
        |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val wide = Multimodal.Decoder.decode(docs, "doc_id", "payload")
        .select(col("doc_id"),
          col("phash_bands")(0).as("b0"), col("phash_bands")(1).as("b1"),
          col("phash_bands")(2).as("b2"), col("phash_bands")(3).as("b3"))
      val bandRows = wide.select(col("doc_id"),
          posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bv"))
      val cand = bandRows
        .select(col("doc_id").as("id_a"), col("band"), col("bv"))
        .join(bandRows.select(col("doc_id").as("id_b"), col("band"),
          col("bv")), Seq("band", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cand
        .join(wide.select(col("doc_id").as("id_a"), col("b0").as("xa0"),
          col("b1").as("xa1"), col("b2").as("xa2"), col("b3").as("xa3")),
          "id_a")
        .join(wide.select(col("doc_id").as("id_b"), col("b0").as("xb0"),
          col("b1").as("xb1"), col("b2").as("xb2"), col("b3").as("xb3")),
          "id_b")
        .withColumn("hamming", graft.functions.LongArrayHamming(
          array(col("xa0"), col("xa1"), col("xa2"), col("xa3")),
          array(col("xb0"), col("xb1"), col("xb2"), col("xb3"))))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    },
  )
}
