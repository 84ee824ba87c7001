package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    val tr = docs.filter(col("doc_id") % 10 < 8)
    time("docs count")(println(docs.count()))
    // stage 1: trigram explode alone
    val grams = tr.select(col("lang"),
      explode(TextAnalysis.charNgramProfile(col("text"), 3)).as("g"))
    time("gram explode count")(println(grams.count()))
    // stage 2: gram explode + md5 hash per occurrence
    val hashed = grams.select(col("lang"),
      (TextAnalysis.tokenHash31(col("g")) % 256).as("b"))
    time("hash per occurrence + agg")(
      println(hashed.groupBy("lang", "b").count().count()))
    // stage 3: distinct-gram first, hash after
    val pre = grams.groupBy("lang", "g").agg(count(lit(1)).as("gcnt"))
      .select(col("lang"),
        (TextAnalysis.tokenHash31(col("g")) % 256).as("b"), col("gcnt"))
      .groupBy("lang", "b").agg(sum("gcnt").as("cnt"))
    time("distinct-gram hash + agg")(println(pre.count()))
    // full current train
    time("langIdTrain")(
      println(TextAnalysis.langIdTrain(tr, "text", "lang").count()))
    spark.stop()
  }
}
