package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the wire format of web-scale training-data
  * dumps (one JSON document per line). A 100 TB crawl ALWAYS contains
  * malformed lines; the production contract is: never fail the job,
  * never silently drop — every input line lands either in the typed
  * corpus or in a quarantine with the raw line preserved for replay.
  *
  * Built on Spark's PERMISSIVE JSON mode with an explicit schema (no
  * sampling-based inference job — inference reads the corpus twice and
  * can mis-type sparse fields at scale) plus a `_corrupt_record` column:
  * parse failures keep the raw line there and null the typed columns.
  * Splitting into corpus/quarantine is one narrow filter each — the
  * scan stays a single pass, no shuffle.
  */
object JsonlCorpus {

  /** The documents-table wire schema. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  final case class Loaded(corpus: DataFrame, quarantine: DataFrame)

  /** Read JSONL at `path`: well-formed lines become typed corpus rows,
    * malformed ones land in the quarantine as (raw line). A line that
    * parses as JSON but misses `doc_id` is quarantined too — a document
    * without an identity cannot be deduplicated or traced. */
  def load(spark: SparkSession, path: String,
      docSchema: StructType = schema): Loaded = {
    require(!docSchema.fieldNames.contains("_corrupt_record"),
      "JsonlCorpus.load: _corrupt_record is reserved for the quarantine")
    val withCorrupt = docSchema.add("_corrupt_record", StringType)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // PERMISSIVE parsing is lazy per-column; materialize the verdict
      // once so corpus/quarantine filters agree on every line
      .withColumn("__bad",
        col("_corrupt_record").isNotNull || col("doc_id").isNull)
    Loaded(
      corpus = raw.filter(!col("__bad"))
        .select(docSchema.fieldNames.map(col).toIndexedSeq: _*),
      quarantine = raw.filter(col("__bad"))
        .select(coalesce(col("_corrupt_record"), to_json(struct(
          docSchema.fieldNames.map(col).toIndexedSeq: _*))).as("raw")))
  }

  /** Ingestion health counters (one aggregate over each side). */
  def stats(loaded: Loaded): (Long, Long) =
    (loaded.corpus.count(), loaded.quarantine.count())
}
