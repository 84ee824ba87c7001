package graft

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val idx = Dedup.tokenIndex(Tables.documents(spark, sfDir), "doc_id", "text", 1)
    time("tokenIndex count")(println(idx.count()))
    val sig = Dedup.minhashSignatures(idx, 32)
    time("signatures")(println(sig.count()))
    val banded = sig.withColumn("band", explode(Dedup.bandKeyCols(2, 16)))
      .select("id", "band")
    val cand = banded.select(col("band"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("id").as("id_b")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(println(cand.count()))
    val rer = Dedup.candidateJaccard(cand, idx).filter(col("jaccard") >= 0.95)
    time("re-rank")(println(rer.count()))
    spark.stop()
  }
}
