package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ZipIndexSpec extends SparkSpec {
  import spark.implicits._

  test("ordinals equal the single-partition window row_number") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(_ => (rnd.nextInt(100000), rnd.nextString(4)))
      .distinct.toDF("k", "s")
    val want = df.withColumn("ord",
        row_number().over(Window.orderBy(col("k"), col("s"))).cast("long"))
      .select("k", "ord").as[(Int, Long)].collect().toMap
    val got = ZipIndex.withOrdinal(df, "ord", Seq(col("k"), col("s")))
      .select("k", "ord").as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("reliable checkpoint path: same ordinals, files written") {
    val dir = specTempDir("zip-ckpt").toString
    try {
      val df = (1 to 200).map(i => (i * 7 % 1000, i)).toDF("k", "v")
      val plain = ZipIndex.withOrdinal(df, "ord", Seq(col("k"), col("v")))
        .select("v", "ord").as[(Int, Long)].collect().toMap
      val reliable = ZipIndex.withOrdinal(df, "ord", Seq(col("k"), col("v")),
          checkpointDir = Some(dir))
        .select("v", "ord").as[(Int, Long)].collect().toMap
      assert(reliable == plain)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .anyMatch(p => p.getFileName.toString.startsWith("rdd-"))
      assert(wrote, s"no rdd-* checkpoint dirs under $dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("no single-partition WindowExec in the plan") {
    val df = spark.range(100).toDF("id")
    val plan = ZipIndex.withOrdinal(df, "ord", Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("empty input and single row") {
    val empty = spark.range(0).toDF("id")
    assert(ZipIndex.withOrdinal(empty, "ord", Seq(col("id"))).count() == 0)
    val one = ZipIndex.withOrdinal(spark.range(1).toDF("id"), "ord",
      Seq(col("id"))).select("ord").as[Long].collect()
    assert(one.toSeq == Seq(1L))
  }

  test("dense 1..n with skewed input partitioning") {
    val df = spark.range(0, 1000, 1, 13).toDF("id")
      .withColumn("k", pmod(col("id") * 2654435761L, lit(997)))
    val ords = ZipIndex.withOrdinal(df, "ord", Seq(col("k"), col("id")), 8)
      .select("ord").as[Long].collect().sorted
    assert(ords.toSeq == (1L to 1000L))
  }
}
