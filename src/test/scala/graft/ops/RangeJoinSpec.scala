package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("differential vs naive inequality join on random data") {
    val rnd = new scala.util.Random(23)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "s", "e")
    for (width <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = points.join(intervals,
          col("p") >= col("s") && col("p") < col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"width=$width")
    }
  }

  test("half-open boundaries: start inclusive, end exclusive") {
    val points = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 4L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("empty and negative-width intervals match nothing") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((1L, 5L, 5L), (2L, 9L, 3L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .count() == 0)
  }

  test("negative values bucket correctly (floor, not truncate)") {
    val points = Seq((1L, -15L), (2L, -1L), (3L, 0L)).toDF("pid", "p")
    val intervals = Seq((1L, -20L, 1L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 8L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("auto-width matches an explicit-width join") {
    val rnd = new scala.util.Random(67)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(2000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 40).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + 20 + rnd.nextInt(80).toLong)
    }.toDF("iid", "s", "e")
    val auto = RangeJoin.pointInIntervalAuto(points, "p", intervals, "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val explicit = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 60L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(auto == explicit)
    // degenerate: no non-empty intervals
    val none = Seq((1L, 5L, 5L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInIntervalAuto(points, "p", none, "s", "e").count() == 0)
  }

  test("intervalOverlap differential vs naive, exactly once per pair") {
    val rnd = new scala.util.Random(47)
    def mk(n: Int, pre: String) = (1 to n).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(90).toLong)
    }.toDF(pre + "id", pre + "s", pre + "e")
    val a = mk(80, "a")
    val b = mk(80, "b")
    for (width <- Seq(3L, 32L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", width)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      val want = a.join(b, col("as") < col("be") && col("bs") < col("ae"))
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == want.sorted, s"width=$width") // incl. multiplicity
    }
  }

  test("pathological interval span fails fast instead of exploding") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val sentinel = Seq((1L, 0L, Long.MaxValue)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", sentinel, "s", "e", 1000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("RangeJoin: interval spans")))
  }

  test("no BroadcastNestedLoopJoin in the plan") {
    val points = spark.range(100).toDF("p")
    val intervals = spark.range(10).select(
      (col("id") * 10).as("s"), (col("id") * 10 + 5).as("e"))
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
