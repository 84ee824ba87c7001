package graft

import org.apache.spark.sql.SparkSession

/** Dev-only per-query repeat profiler (not part of the driver contract).
  * Usage: runMain graft.DevBench <reps> [queryName ...]  — no names = all.
  * Prints per-rep wall times so warm-vs-cold and variance are visible,
  * plus the formatted plan when SPARK_GRAFT_EXPLAIN=1.
  */
object DevBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // first arg is the rep count if numeric, else a query name (reps=3)
    val firstIsReps = args.headOption.exists(_.forall(_.isDigit))
    val reps = if (firstIsReps) args.head.toInt else 3
    val rest = if (firstIsReps) args.drop(1).toSeq else args.toSeq
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}; " +
      s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // match Bench: codegen cache sized past the suite (static conf)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir",
        graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devbench] $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
