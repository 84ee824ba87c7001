package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("bit interleave: hand-computed vectors, dims on disjoint bits") {
    // a = 0b101 -> even positions 10001; b = 0b011 -> odd positions 1010
    val df = Seq((5L, 3L)).toDF("a", "b")
    val z = df.select(ZOrder.zkey(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().head
    assert(z == 0x1BL, s"z=$z") // 011011: b1 a1 b0 a0 pairs = 27
    // extremes
    val zz = Seq((0L, 0L), (7L, 0L), (0L, 7L), (7L, 7L)).toDF("a", "b")
      .select(ZOrder.zkey(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(zz == Seq(0L, 21L, 42L, 63L), zz.toString)
  }

  test("aligned 4^k runs are exact 2^k x 2^k tiles (the skipping bound)") {
    // full 32x32 grid, bits=5; tiles of 4^2=16 keys must span 4x4
    val grid = (for { a <- 0 until 32; b <- 0 until 32 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val spans = grid
      .select(ZOrder.zkey(col("a"), col("b"), 5).as("z"),
        col("a"), col("b"))
      .groupBy(expr("z div 16").as("tile"))
      .agg(count(lit(1)).as("n"),
        (max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length == 64 && spans.forall(_._2 == 16))
    assert(spans.forall(t => t._3 == 3 && t._4 == 3),
      "every aligned 16-key run must be a 4x4 tile")
  }

  test("zkeySql mirrors the column form token for token") {
    val df = (0L until 200L).map(i => (i % 17, i % 23)).toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zkeySql("a", "b", 5)} AS z FROM zt")
      .as[Long].collect().toSeq
    val viaCol = df.select(ZOrder.zkey(col("a"), col("b"), 5).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("layout: range partitions carry disjoint z-ranges (file stats " +
    "would prune)") {
    val grid = (for { a <- 0 until 64; b <- 0 until 64 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val laid = ZOrder.layout(grid, col("a"), col("b"), bits = 6,
      partitions = 8)
    val ranges = laid
      .select(org.apache.spark.sql.functions.spark_partition_id()
        .as("pid"), col("z_key"))
      .groupBy("pid").agg(min("z_key").as("lo"), max("z_key").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(x, y) =>
      assert(x._3 < y._2,
        s"partition z-ranges must be disjoint: $x vs $y")
    }
  }
}
