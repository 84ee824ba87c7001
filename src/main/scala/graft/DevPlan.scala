package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper (not part of the driver contract): writes
  * `explain("formatted")` for the named queries to
  * `$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt`, under the SAME session
  * configuration as `graft.Bench` (master/shuffle partitions from
  * `$SPARK_GRAFT_CPUS`, data from `$SPARK_GRAFT_SF_DIR`) so the dumped
  * plans are the plans the bench actually times — a plan dumped at
  * local[4]/sf0.01 can differ (broadcast thresholds, adaptive targets,
  * partition-count-conditional rebalances).
  *
  * Usage: runMain graft.DevPlan <suffix> <queryName ...>
  */
object DevPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DevPlan <suffix> <query ...>")
    val suffix = args.head
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r18"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir", graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // capture the string form rather than letting explain print
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[devplan] wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
