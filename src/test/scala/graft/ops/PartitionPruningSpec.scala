package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SCALE.md §2: hive-style partitioned layout + partition pruning — the
  * write pattern that lets a 100 TB event store answer per-type queries
  * by reading one directory. */
class PartitionPruningSpec extends SparkSpec {

  test("partitionBy write + filtered read prunes to one partition") {
    val out = specTempDir("part-ev").toString
    graft.Tables.events(spark, sfDir)
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)

    // pruned read sees exactly the purchase rows
    val want = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(q.collect()(0).getLong(0) == want && want > 0)

    // physical layout: one directory per type
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=purchase")))
  }
}
