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
}
