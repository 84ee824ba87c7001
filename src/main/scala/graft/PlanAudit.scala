package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of representative queries for
  * the scale audit (pushdown / pruning / join strategy / codegen —
  * SURVEY.md §4).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // same tmp warehouse as Verify/Bench: auditing a bucketed-table
      // query must not drop a spark-warehouse/ into the repo tree
      .config("spark.sql.warehouse.dir",
        graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_agg", "q2_filter_project", "q5_region_revenue",
        "ann_topk_bruteforce", "dedup_minhash_lsh")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
