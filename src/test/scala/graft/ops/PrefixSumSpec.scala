package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("running total equals the single-partition window cumsum") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 400).map(i => (i, 1L + rnd.nextInt(500)))
      .toDF("k", "w")
    val want = df.withColumn("run",
        sum(col("w")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "run").as[(Int, Long)].collect().toMap
    val got = PrefixSum.withRunningTotal(df, "run", col("w"), Seq(col("k")))
      .select("k", "run").as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("running total is independent of input partitioning") {
    val df = (1 to 300).map(i => (i, (i * 7 % 23).toLong + 1L)).toDF("k", "w")
    val a = PrefixSum.withRunningTotal(df, "run", col("w"), Seq(col("k")))
      .select("k", "run").as[(Int, Long)].collect().toMap
    val b = PrefixSum.withRunningTotal(df.repartition(11), "run", col("w"),
        Seq(col("k")), numParts = 3)
      .select("k", "run").as[(Int, Long)].collect().toMap
    assert(a == b)
  }

  test("no single-partition WindowExec in the plan") {
    val df = (1 to 50).map(i => (i, i.toLong)).toDF("k", "w")
    val plan = PrefixSum.withRunningTotal(df, "run", col("w"), Seq(col("k")))
      .queryExecution.executedPlan.toString
    // a global-order window would appear as Window ... with an empty
    // partition spec; ours must always partition by the pid column
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"found a global (unpartitioned) window:\n$plan")
  }

  test("packIntoBins: contiguous bins, budget respected at start offsets") {
    val df = (1 to 100).map(i => (i.toLong, 100L + (i % 7) * 50L))
      .toDF("doc_id", "n_tokens")
    val packed = PrefixSum.packIntoBins(df, col("n_tokens"), budget = 1000L,
        orderBy = Seq(col("doc_id")))
      .select("doc_id", "n_tokens", "start_offset", "bin")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // start offsets are the exclusive cumsum in doc_id order
    var run = 0L
    packed.foreach { case (_, w, start, bin) =>
      assert(start == run, s"start $start != running $run")
      assert(bin == start / 1000L)
      run += w
    }
    // bins are non-decreasing and dense enough (no empty bins skipped
    // beyond what long docs straddle)
    val bins = packed.map(_._4)
    assert(bins.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("grouped running total equals the per-group window cumsum; " +
    "only __pid-keyed windows plan") {
    val rnd = new scala.util.Random(13)
    // 3 groups, heavy skew: group g0 holds ~90% of the rows
    val df = (1 to 800).map { i =>
      val g = if (rnd.nextInt(10) < 9) "g0" else s"g${1 + rnd.nextInt(2)}"
      (g, i, rnd.nextInt(50).toLong + 1L)
    }.toDF("g", "k", "w")
    val want = df.withColumn("run", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("k"))
          .rowsBetween(org.apache.spark.sql.expressions
            .Window.unboundedPreceding, 0)))
      .select("k", "run").as[(Int, Long)].collect().toMap
    val out = PrefixSum.withGroupedRunningTotal(df, "run", Seq("g"),
      col("w"), Seq(col("k")), numParts = 8)
    val got = out.select("k", "run").as[(Int, Long)].collect().toMap
    assert(got == want)
    val wide = out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Window [") && !l.contains("__pid"))
      .toList
    assert(wide.isEmpty, s"non-__pid window planned:\n${wide.mkString}")
  }

  test("grouped bins restart at zero per group and respect budget") {
    val df = Seq(("a", 1, 600L), ("a", 2, 600L), ("a", 3, 600L),
      ("b", 1, 100L), ("b", 2, 2000L), ("b", 3, 5L))
      .toDF("g", "k", "w")
    val got = PrefixSum.packIntoGroupedBins(df, Seq("g"), col("w"),
        budget = 1000L, orderBy = Seq(col("k")))
      .select("g", "k", "start_offset", "bin")
      .as[(String, Int, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(got == Map(
      ("a", 1) -> (0L, 0L), ("a", 2) -> (600L, 0L),
      ("a", 3) -> (1200L, 1L),
      ("b", 1) -> (0L, 0L), ("b", 2) -> (100L, 0L),
      ("b", 3) -> (2100L, 2L)))
  }
}
