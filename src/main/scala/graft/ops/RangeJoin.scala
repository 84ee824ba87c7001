package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join — the scalable plan for joins whose ONLY
  * predicate is an inequality (`point BETWEEN start AND end`). Spark's
  * built-in planner can't hash such a join and falls back to
  * BroadcastNestedLoopJoin (a cross-join scan of every point against
  * every interval). Binning turns it into an equi-join: each interval is
  * exploded to the fixed-width buckets it covers, each point maps to
  * exactly one bucket, and the range predicate remains as a residual
  * filter after the bucket equi-join. Shuffle is keyed on bucket id —
  * cost O(|points| + Σ span/width), never |points|·|intervals|.
  *
  * Width is the dial: ~the median interval span is a good default
  * (≤2 buckets per interval while keeping buckets selective); hot
  * buckets (skewed time ranges) are AQE-skew-join territory.
  */
object RangeJoin {

  /** Exact floor(x / w) on longs (`div` truncates toward zero; correcting
    * with pmod keeps negative points/starts on the right bucket). */
  private def floorDiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** Explodes each half-open [s, e) interval row to its covered bucket
    * ids in `out`, dropping empty intervals. Pathological spans (e.g. an
    * open-ended Long.MaxValue sentinel end) fail fast via `raise_error`
    * rather than exploding a billion-element sequence; the guard lives
    * INSIDE the sequence bound so column pruning can't eliminate it. */
  private def binned(df: DataFrame, s: String, e: String, out: String,
      bucketWidth: Long, maxBuckets: Long): DataFrame = {
    val bs = floorDiv(col(s), bucketWidth)
    val be = floorDiv(col(e) - 1, bucketWidth)
    val guardedEnd = when(be - bs >= maxBuckets,
      raise_error(concat(
        lit(s"RangeJoin: interval spans >= $maxBuckets buckets at width " +
          s"$bucketWidth (open-ended sentinel end? widen bucketWidth or " +
          "cap ends): "),
        col(s), lit(".."), col(e)))).otherwise(be)
    df.filter(col(e) > col(s))
      .withColumn(out, explode(sequence(bs, guardedEnd)))
  }

  /** Joins each row of `points` to every row of `intervals` whose
    * HALF-OPEN range [startCol, endCol) contains `pointCol`. All three
    * columns must be LongType in the same unit (e.g. epoch micros).
    * Output = point columns ++ interval columns. Intervals with
    * end <= start match nothing and are dropped. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = points.withColumn("__pb", floorDiv(col(pointCol), bucketWidth))
    val ivs = binned(intervals, startCol, endCol, "__ib",
      bucketWidth, maxBucketsPerInterval)
    pts.join(ivs,
        col("__pb") === col("__ib") &&
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__pb", "__ib")
  }

  /** [[pointInInterval]] with a STATS-DRIVEN width: samples the interval
    * spans and uses their median (clamped to >= 1), so each interval
    * covers <= 2 buckets while buckets stay selective — the same
    * inspect-then-choose pattern as broadcast-vs-shuffle decisions. Runs
    * one small aggregation job over `intervals` before planning. */
  def pointInIntervalAuto(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val spans = intervals
      .filter(col(endCol) > col(startCol))
      .select((col(endCol) - col(startCol)).cast("double").as("span"))
    val width = spans.stat.approxQuantile("span", Array(0.5), 0.01) match {
      case Array(m) if m >= 1.0 => m.toLong
      case _ => 1L // no non-empty intervals: width is irrelevant
    }
    pointInInterval(points, pointCol, intervals, startCol, endCol,
      width, maxBucketsPerInterval)
  }

  /** Joins rows of `left` to rows of `right` whose half-open ranges
    * OVERLAP: [s1,e1) ∩ [s2,e2) ≠ ∅, i.e. s1 < e2 AND s2 < e1. Both
    * sides explode to covered buckets and equi-join on bucket id; a pair
    * sharing several buckets would match once per shared bucket, so the
    * join keeps only the FIRST shared bucket — the bucket of
    * max(s1, s2), the overlap's left edge — which each qualifying pair
    * has exactly one of (no distinct pass needed). */
  def intervalOverlap(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = binned(left, leftStart, leftEnd, "__lb",
      bucketWidth, maxBucketsPerInterval)
    val r = binned(right, rightStart, rightEnd, "__rb",
      bucketWidth, maxBucketsPerInterval)
    l.join(r,
        col("__lb") === col("__rb") &&
        col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd) &&
        col("__lb") === floorDiv(greatest(col(leftStart), col(rightStart)),
          bucketWidth))
      .drop("__lb", "__rb")
  }
}
