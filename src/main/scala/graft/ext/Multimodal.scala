package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the per-batch
  * decode/feature-extract pipeline shape.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[StubDecoder]]); everything Spark —
  * schema, binary column handling, partition-wise batched processing via
  * `mapPartitions` over a typed Dataset (the Scala analog of
  * `mapInPandas`), metadata extraction with codegen'd built-ins — is real
  * and tested.
  */
object Multimodal {

  /** Byte length of a binary payload. */
  def byteLen(bin: Column): Column = octet_length(bin)

  /** Lowercase sha-256 content address of a payload. */
  def contentAddress(bin: Column): Column = sha2(bin, 256)

  /** "Frame sampling" over an opaque payload: the hex of `frameBytes`
    * bytes at byte offset `frameIdx * strideBytes` — the Spark-side shape
    * of sampling every k-th video frame / audio window. Hex-domain
    * substring so the identical expression runs on engines without binary
    * slicing. */
  def sampleFrameHex(bin: Column, frameIdx: Int, strideBytes: Int,
      frameBytes: Int): Column =
    substring(hex(bin), frameIdx * strideBytes * 2 + 1, frameBytes * 2)

  /** Magic-byte sniffing (real decoders dispatch on these). */
  def sniffFormat(bin: Column): Column = {
    val magic = substring(hex(bin), 1, 8)
    when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("FFD8FF"), "jpeg")
      .when(magic.startsWith("52494646"), "riff")
      .otherwise("unknown")
  }

  /** One decoded record: the typed metadata a real image decode would
    * yield, plus extracted features — a 16-bin coarse byte histogram
    * (REAL computation over the payload, codec-free) and the post-resize
    * dimensions. */
  final case class DecodedMeta(
      doc_id: Long, format: String, byte_len: Long,
      width: Int, height: Int, channels: Int,
      resized_w: Int, resized_h: Int,
      features: Seq[Long])

  /** STUB decoder — the container ships no codecs. Deterministic fake:
    * dimensions derived from the payload's first bytes so tests are
    * stable. A real deployment swaps `decodeOne` for javax.imageio /
    * ffmpeg bindings; the partition-wise batching around it is the real,
    * scale-relevant part (one decoder instance per partition, streamed
    * iterator, no per-row setup).
    */
  object StubDecoder {
    /** Target edge for the resize step (as a real pipeline would
      * normalize to a model's input resolution). */
    val ResizeTarget = 224

    def decodeOne(id: Long, payload: Array[Byte]): DecodedMeta = {
      // ??? <- real codec goes here; deterministic fake dims below
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val w = 64 + (b0 % 64)
      val h = 64 + (b1 % 64)
      // resize: scale shorter edge to ResizeTarget, keep aspect (the
      // arithmetic is the real operator; pixel resampling is the codec's)
      val scale = ResizeTarget.toDouble / math.min(w, h)
      // feature extraction: REAL 16-bin byte histogram over the payload
      val hist = new Array[Long](16)
      payload.foreach(b => hist((b & 0xff) >> 4) += 1L)
      DecodedMeta(id, "stub", payload.length.toLong,
        width = w, height = h, channels = 3,
        resized_w = math.round(w * scale).toInt,
        resized_h = math.round(h * scale).toInt,
        features = hist.toSeq)
    }

    /** The pipeline: binary DataFrame -> partition-batched decode ->
      * typed metadata Dataset. Mirrors `mapInPandas` batch semantics. */
    def decode(df: DataFrame, idCol: String = "doc_id",
        binCol: String = "payload"): Dataset[DecodedMeta] = {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long"), col(binCol))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // per-partition decoder setup would happen HERE (once), then
          // stream the batch through it
          it.map { case (id, payload) => decodeOne(id, payload) }
        }
    }
  }
}
