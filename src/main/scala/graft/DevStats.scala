package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only structural profiler (not part of the driver contract).
  * Usage: runMain graft.DevStats [queryName ...]  — no names = all.
  * Runs each query once cold + once warm under a SparkListener and
  * prints, for the WARM run: wall seconds, job/stage/task counts, and
  * shuffle read/write bytes. Stage count ~ exchange count + scans; the
  * table sorted by stages names the overhead-dominated plans, the one
  * sorted by shuffle bytes names the data movers.
  */
object DevStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir", graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    // one shared monitor for BOTH the listener increments and the
    // between-pass reset: the listener's own `synchronized` and the
    // main body's `synchronized` were two different locks (listener
    // instance vs this object), so a reset could interleave with an
    // in-flight increment
    val lock = new Object
    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    @volatile var shRead = 0L
    @volatile var shWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          tasks += s.stageInfo.numTasks
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        lock.synchronized {
          val m = t.taskMetrics
          if (m != null) {
            shRead += m.shuffleReadMetrics.totalBytesRead
            shWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val rows = names.map { n =>
      val fn = SparkEntry.queries(n)
      // cold pass: codegen + plan warmup, not measured
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[devstats] $n failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      // settle listener events from the cold pass (listenerBus is
      // private[spark]; a short sleep is fine for a dev tool)
      Thread.sleep(400)
      lock.synchronized {
        jobs = 0; stages = 0; tasks = 0; shRead = 0; shWrite = 0 }
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      spark.catalog.clearCache()
      val r = (n, sec, jobs, stages, tasks, shRead, shWrite)
      println(f"[devstats] $n%-34s ${sec}%6.2f s  j=$jobs%-3d st=$stages%-4d " +
        f"tk=$tasks%-5d shR=${shRead / 1024}%7d KiB shW=${shWrite / 1024}%7d KiB")
      r
    }
    println("\n==== by warm seconds ====")
    rows.sortBy(-_._2).take(40).foreach { case (n, s, j, st, tk, r, w) =>
      println(f"$n%-34s $s%6.2f s  j=$j%-3d st=$st%-4d tk=$tk%-5d " +
        f"shR=${r / 1024}%7d KiB shW=${w / 1024}%7d KiB") }
    println("\n==== by stages ====")
    rows.sortBy(-_._4).take(40).foreach { case (n, s, j, st, tk, r, w) =>
      println(f"$n%-34s $s%6.2f s  j=$j%-3d st=$st%-4d tk=$tk%-5d " +
        f"shR=${r / 1024}%7d KiB shW=${w / 1024}%7d KiB") }
    println("\n==== by shuffle read ====")
    rows.sortBy(-_._6).take(25).foreach { case (n, s, j, st, tk, r, w) =>
      println(f"$n%-34s $s%6.2f s  j=$j%-3d st=$st%-4d tk=$tk%-5d " +
        f"shR=${r / 1024}%7d KiB shW=${w / 1024}%7d KiB") }
    spark.stop()
  }
}
