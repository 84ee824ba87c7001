package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** A long-lived corpus accretes schema versions (a new `quality` column
  * appears mid-crawl); the read side must union every batch without a
  * rewrite. Parquet `mergeSchema` is the mechanism — old rows backfill
  * the new column with null, and an explicit post-read `select` pins
  * the contract schema so downstream operators never depend on which
  * batch arrived first.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions batch generations with null backfill") {
    val dir = specTempDir("graft-evo").toString
    Seq((1L, "old doc", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/batch=0")
    Seq((2L, "new doc", "en", 0.9))
      .toDF("doc_id", "text", "lang", "quality")
      .write.parquet(s"$dir/batch=1")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("quality"))
    assert(merged.columns.toSeq ==
      Seq("doc_id", "text", "lang", "quality"))
    val rows = merged.orderBy("doc_id")
      .as[(Long, String, String, Option[Double])].collect().toSeq
    assert(rows == Seq(
      (1L, "old doc", "en", None),
      (2L, "new doc", "en", Some(0.9))))

    // without mergeSchema the footer of ONE batch wins — the quality
    // column may be silently absent; the option is not cosmetic
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length >= 3)
  }
}
