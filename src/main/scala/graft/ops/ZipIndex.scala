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
  * sort uses) and sort within partitions, so partition i holds the rank
  * range (offset_i, offset_i + count_i]. The in-partition position comes
  * free from `monotonically_increasing_id()`'s bit layout
  * (partitionId * 2^33 + rowOffset, assigned in flow order — i.e. sorted
  * order here), so no WindowExec and no second hash exchange. Offsets are
  * a prefix sum over the per-partition counts — #partitions rows, a
  * driver-sized side relation broadcast back. The counts sub-plan shares
  * the range exchange via ReuseExchange, so the data shuffles once.
  */
object ZipIndex {

  private val MidBits = 33 // monotonically_increasing_id: pid << 33 | offset

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
    // localCheckpoint: the counts sub-plan and the output both consume
    // `ranged`; materializing it once makes them read the SAME partition
    // boundaries by construction, rather than relying on ReuseExchange
    // to dedup two range shuffles (if reuse ever failed to fire, two
    // independently sampled RangePartitioners could disagree and the
    // offsets would silently mismatch the pids). Costs one cached copy;
    // lineage is truncated, so executor loss fails the job rather than
    // recomputing — acceptable for manifest/vocabulary enumeration.
    val ranged = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), MidBits).cast("int"))
      .withColumn("__local", col("__mid").bitwiseAND((1L << MidBits) - 1))
      .localCheckpoint(false)
    // per-partition counts (map-side combine => one row per partition on
    // the wire), prefix-summed via triangular join (O(n²) on ≤ numParts
    // rows) — no unpartitioned window anywhere in the plan
    val counts = ranged.groupBy(col("__pid"))
      .agg((max(col("__local")) + 1L).as("__cnt"))
    val earlier = counts.select(col("__pid").as("__pid2"),
      col("__cnt").as("__cnt2"))
    val offsets = counts
      .join(earlier, col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__cnt2")), lit(0L)).as("__offset"))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(ordCol, col("__offset") + col("__local") + 1L)
      .drop("__mid", "__pid", "__local", "__offset")
  }
}
