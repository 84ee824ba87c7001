package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off suffix-array capacity probe at arbitrary replication —
  * the manual extension of ScaleCurve's `probe_suffix_chars` for
  * datapoints past the per-round curve budget:
  * `runMain graft.DevSaProbe <k> [sfDir]` builds k salted copies of
  * the src0 shard through the SAME [[ScaleCurve.saltedSaCorpus]]
  * builder the curve probe uses (one implementation — manual
  * datapoints stay comparable with the curve's; the builder asserts
  * the max-token-length assumption behind the linear-span-volume
  * claim) and times [[ext.SuffixArray.duplicatedSpans]] over it. */
object DevSaProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 16
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val rep = ScaleCurve.saltedSaCorpus(spark, dir, k)
    val chars = rep.agg(sum(length(col("text")))).head().getLong(0)
    val t0 = System.nanoTime()
    val spans = ext.SuffixArray.duplicatedSpans(rep, "doc_id", "text",
      minLen = 20)
    val n = spans.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spans.unpersist()
    println(f"[devsa] k=$k chars=$chars spans=$n sec=$sec%.1f" +
      f" (${chars / sec / 1000}%.0f kchars/s)")
    spark.stop()
  }
}
