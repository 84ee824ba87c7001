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

  val defs: Seq[QueryDef] = Seq(

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

    // modality dispatch: format sniff + per-format counts (the payloads
    // are all text => 'unknown'; the dispatch expression is the operator)
    QueryDef("mm_format_dispatch",
      """SELECT CASE
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '89504E47%' THEN 'png'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE 'FFD8FF%' THEN 'jpeg'
        |    WHEN substring(hex(encode(text)), 1, 8) LIKE '52494646%' THEN 'riff'
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
  )
}
