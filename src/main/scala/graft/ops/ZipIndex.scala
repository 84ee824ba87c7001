package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable global enumeration — the distributed replacement for
  * `row_number() OVER (ORDER BY ...)`, which moves the whole input to ONE
  * partition (Spark's WindowExec warns exactly this). The reference's
  * enumerated renaming (`upload_file.py:215-226`) and any
  * "assign ordinal by sort order" need a total order, but not a single
  * machine.
  *
  * Plan: range-repartition on the sort key (the same exchange a global
  * sort uses), `row_number` WITHIN each range partition (parallel), then
  * add per-partition row-count offsets — computed with a tiny auxiliary
  * aggregation (#partitions rows) broadcast back. Two narrow passes over
  * the data, no single-partition stage; ordinals are identical to the
  * single-partition window for any total sort key.
  */
object ZipIndex {

  /** Adds `ordCol` = 1-based ordinal of the row under `orderBy` (which
    * must be a total order for deterministic results).
    *
    * @param numParts range partitions; defaults to
    *                 spark.sql.shuffle.partitions */
  def withOrdinal(df: DataFrame, ordCol: String, orderBy: Seq[Column],
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // one exchange: range partitioner on the sort key; rows within each
    // partition sorted locally => partition i holds rank range
    // (offset_i, offset_i + count_i]
    val ranged = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__local",
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__pid"))
          .orderBy(orderBy: _*)))
    // per-partition counts: #partitions rows — a driver-sized side table.
    // prefix-sum via triangular self-join (O(n²) on ≤ numParts rows)
    // rather than an unpartitioned window, so no single-partition
    // WindowExec appears anywhere in the plan
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
    val earlier = counts.select(col("__pid").as("__pid2"),
      col("__cnt").as("__cnt2"))
    val offsets = counts
      .join(earlier, col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__cnt2")), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(ordCol, col("__offset") + col("__local"))
      .drop("__pid", "__local", "__offset")
  }
}
