package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row with
  * `rightTs <= leftTs` within the same key group. Spark has no native
  * operator for this (SURVEY.md §2.4 lists the join surface; as-of is the
  * canonical "operator the engine adds").
  *
  * Implementation is the UNION-SORT algorithm, not a range join: tag both
  * inputs, sort each key group by (ts, side) with right rows first at
  * equal timestamps (ASOF `>=` semantics), then propagate the last seen
  * right row with `last_value(ignoreNulls)` over an unbounded-preceding
  * frame. One shuffle on the key + one sort — O(n log n) per group,
  * versus the O(n·m) explosion of the naive `leftTs >= rightTs` range
  * join + argmax. This is the plan shape that survives 100 TB: shuffle
  * keyed on the join key, a single window pass, no cross product.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its columns are emitted with `prefix`)
    * @param keyCols    equi-key columns present in both inputs
    * @param tsCol      event-time column present in both inputs
    * @param valueCols  right-side columns to carry (besides its ts)
    * @param prefix     prefix for emitted right-side columns
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCols, tsCol, valueCols, prefix, forward = false)

  /** Forward as-of: for every left row, the single EARLIEST right row
    * with `rightTs >= leftTs` (the feature-engineering twin: "next event
    * at or after"). Same union-sort plan, traversed in descending time
    * order. Equal-`rightTs` ties resolve to the lexicographically
    * smallest (ts, values) struct — deterministic under any partitioning. */
  def leftAsOfForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], prefix: String = "asof_"): DataFrame =
    asOf(left, right, keyCols, tsCol, valueCols, prefix, forward = true)

  private def asOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], prefix: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // side flag: right rows sort BEFORE left rows at equal ts => a right
    // row at exactly leftTs is visible (>= semantics, DuckDB ASOF parity)
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn(s"$prefix$tsCol", lit(null).cast(left.schema(tsCol).dataType))
    // a right row with NULL ts can never satisfy rightTs <= leftTs (the
    // comparison is undefined); unfiltered it would sort first and get
    // forward-filled into every later left row. DuckDB ASOF drops them too.
    val rightNonNullTs = right.filter(col(tsCol).isNotNull)
    val taggedRight0 = rightNonNullTs.select(
      (keyCols.map(col) :+ col(tsCol).as(s"$prefix$tsCol")) ++
        valueCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn("__side", lit(0))
      .withColumn(tsCol, col(s"$prefix$tsCol"))
    // align schemas: left rows carry null right-values, right rows carry
    // null left-values
    val allRightVals = valueCols.map(c => s"$prefix$c")
    val taggedLeftFull = allRightVals.foldLeft(taggedLeft) { (df, c) =>
      df.withColumn(c, lit(null).cast(taggedRight0.schema(c).dataType))
    }
    val leftOnlyCols = leftCols.diff(keyCols :+ tsCol)
    val taggedRightFull = leftOnlyCols.foldLeft(taggedRight0) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val ordered: Seq[Column] =
      (leftCols ++ Seq("__side", s"$prefix$tsCol") ++ allRightVals).map(col)
    val unioned = taggedLeftFull.select(ordered: _*)
      .unionByName(taggedRightFull.select(ordered: _*))

    // pack the right row into ONE struct and forward-fill it atomically:
    // per-column fills could combine fields of two different right rows
    // when a right value column is null. The struct is non-null for every
    // right row (even with null members), so last(ignoreNulls) picks a
    // whole row. Struct order also gives equal-ts right rows a
    // deterministic winner (lexicographic on (ts, values)).
    val asofStruct = struct((s"$prefix$tsCol" +: allRightVals).map(col): _*)
    // traversal direction decides the semantics: ascending ts => most
    // recent rightTs <= leftTs; descending ts => earliest rightTs >=
    // leftTs. Either way right rows sort before left rows at equal ts
    // (inclusive semantics), and the struct ordering makes the winner
    // among equal right timestamps deterministic.
    // NULLS FIRST in BOTH directions: a left row with NULL ts has an
    // undefined comparison against every right ts and must match nothing
    // — sorting it first gives it an empty preceding frame. (asc is
    // nulls-first by default; desc defaults to nulls-LAST, which would
    // hand a null-ts left row the whole partition as its frame.)
    val timeOrder =
      if (forward)
        Seq(col(tsCol).desc_nulls_first, col("__side").asc, asofStruct.desc)
      else Seq(col(tsCol).asc_nulls_first, col("__side").asc, asofStruct.asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("__asof",
        last(when(col("__side") === 0, asofStruct), ignoreNulls = true)
          .over(w))
    val unpacked = (s"$prefix$tsCol" +: allRightVals).foldLeft(filled) {
      (df, c) => df.withColumn(c, col("__asof").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__asof")
  }
}
