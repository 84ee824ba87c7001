package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan contracts as assertions — the scale audit (SURVEY §4, SCALE.md)
  * turned into CI guarantees. A query whose physical plan regresses
  * (lost pushdown, a surprise cartesian, a shuffle where a broadcast
  * belongs) should fail a test, not wait for the next manual
  * `.explain` read. String-based on the EXECUTED plan (post-AQE
  * structure for the static checks; cheap, version-tolerant, and
  * exactly what a reviewer greps for).
  */
object PlanChecks {

  def executedPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Fails on `CartesianProduct` — the unbounded pair blowup. Broadcast
    * nested-loop joins are NOT flagged: their build side is a
    * broadcast, i.e. something the planner already sized as small. */
  def assertNoCartesian(df: DataFrame): Unit = {
    val plan = executedPlan(df)
    if (plan.contains("CartesianProduct"))
      throw new IllegalStateException(
        s"plan contract violated: CartesianProduct present\n$plan")
  }

  /** Fails unless some scan pushes a filter mentioning `fragment`
    * (e.g. a column name or `EqualTo(col,value)`). */
  def assertPushedFilter(df: DataFrame, fragment: String): Unit = {
    val plan = executedPlan(df)
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    if (!pushed.contains(fragment))
      throw new IllegalStateException(
        s"plan contract violated: no pushed filter matches '$fragment'" +
          s"\npushed: $pushed")
  }

  /** Fails unless the plan joins via broadcast (hash or nested-loop) —
    * the small-dim star-join contract. */
  def assertBroadcastJoin(df: DataFrame): Unit = {
    val plan = executedPlan(df)
    if (!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"))
      throw new IllegalStateException(
        s"plan contract violated: no broadcast join\n$plan")
  }

  /** Fails if the number of shuffle exchanges exceeds `max` — the
    * shuffle-budget contract for a pipeline stage. */
  def assertExchangesAtMost(df: DataFrame, max: Int): Unit = {
    val plan = executedPlan(df)
    val n = plan.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("BroadcastExchange") &&
        !l.contains("ReusedExchange"))
    if (n > max)
      throw new IllegalStateException(
        s"plan contract violated: $n shuffle exchanges (max $max)\n$plan")
  }

  /** Fails unless at least one whole-stage-codegen stage fused `op`
    * (the `*(n) Op` prefix in executedPlan). Runs the query first:
    * under AQE the pre-execution plan string carries no codegen
    * markers (`isFinalPlan=false`), so this is the one check that
    * must observe the FINAL plan. */
  def assertCodegenFused(df: DataFrame, op: String): Unit = {
    val qe = df.queryExecution
    qe.toRdd.foreachPartition(_ => ()) // finalize AQE + codegen ids
    val plan = qe.executedPlan.toString
    val fused = plan.linesIterator.exists(l =>
      l.trim.matchesRegexForFusion(op))
    if (!fused)
      throw new IllegalStateException(
        s"plan contract violated: '$op' not inside WholeStageCodegen\n$plan")
  }

  private implicit class FusionRegex(private val line: String)
      extends AnyVal {
    def matchesRegexForFusion(op: String): Boolean =
      line.matches(raw".*\*\(\d+\)\s.*" + java.util.regex.Pattern.quote(op)
        + ".*")
  }
}
