package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-JOB profiler (not part of the driver contract).
  * Usage: runMain graft.DevJobs <queryName> — runs the query once cold,
  * once warm, and for the WARM run prints every Spark job with its wall
  * milliseconds, stage/task counts and the call site, so iterative
  * operators' per-round job structure is visible (DevStats only totals).
  */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: DevJobs <queryName>")
    val name = args.head
    val fn = SparkEntry.queries(name)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir", graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val lock = new Object
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val stages = scala.collection.mutable.Map[Int, Int]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized {
          if (record) {
            val site = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
              .mkString(" | ").take(120)
            starts(j.jobId) = (System.nanoTime(), site)
            stages(j.jobId) = j.stageIds.size
          }
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        lock.synchronized {
          starts.remove(j.jobId).foreach { case (t0, site) =>
            val ms = (System.nanoTime() - t0) / 1e6
            lines += f"[devjobs] job=${j.jobId}%4d ${ms}%8.1f ms  " +
              f"st=${stages.getOrElse(j.jobId, 0)}%2d  $site"
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        ()
    }
    spark.sparkContext.addSparkListener(listener)
    // cold
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    // warm, recorded
    lock.synchronized { record = true }
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(400)
    lines.foreach(println)
    println(f"[devjobs] TOTAL $name wall=$wall%.2f s jobs=${lines.size}")
    spark.stop()
  }
}
