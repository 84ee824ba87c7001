package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SkewAndSinksSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val small = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedEquiJoin(large, small, "k", buckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("sinks: parquet/csv/json round-trip preserves data") {
    val df = graft.Tables.nation(spark, sfDir)
    val base = specTempDir("sinks")
    df.write.parquet(s"$base/p")
    df.write.option("header", "true").csv(s"$base/c")
    df.write.json(s"$base/j")
    val p = spark.read.parquet(s"$base/p")
    val c = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/c")
    val j = spark.read.json(s"$base/j")
    assert(p.count() == 25 && c.count() == 25 && j.count() == 25)
    val want = df.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(p.orderBy("n_nationkey").collect().map(_.toSeq).toSeq == want)
    assert(c.select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").as[(Int, String, Int)].collect().toSeq ==
      want.map(r => (r(0), r(1), r(2))))
    // json loses column order + int width but not content
    assert(j.select(col("n_nationkey").cast("int"), col("n_name"),
      col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").as[(Int, String, Int)].collect().toSeq ==
      want.map(r => (r(0), r(1), r(2))))
  }

  test("syncPlan finds missing and changed files only") {
    import graft.catalog.FileCatalog
    val a = specTempDir("sync-a")
    val b = specTempDir("sync-b")
    Files.writeString(a.resolve("same.txt"), "xx")
    Files.writeString(b.resolve("same.txt"), "xx")
    Files.writeString(a.resolve("changed.txt"), "longer content")
    Files.writeString(b.resolve("changed.txt"), "short")
    Files.writeString(a.resolve("missing.txt"), "new")
    val plan = Transfer.syncPlan(
      FileCatalog.list(spark, a.toUri.toString),
      FileCatalog.list(spark, b.toUri.toString))
      .select("name", "reason").as[(String, String)].collect().toMap
    assert(plan == Map("changed.txt" -> "changed", "missing.txt" -> "missing"))
  }

  test("approx_count_distinct tracks exact within 5% on orders") {
    val o = graft.Tables.orders(spark, sfDir)
    val exact = o.select(countDistinct("o_custkey")).as[Long].collect()(0)
    val approx = o.select(approx_count_distinct("o_custkey")).as[Long].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("sinks: orc and text round-trips") {
    val base = specTempDir("sinks2")
    val df = graft.Tables.region(spark, sfDir)
    df.write.orc(s"$base/o")
    assert(spark.read.orc(s"$base/o").orderBy("r_regionkey")
      .collect().map(_.toSeq).toSeq ==
      df.orderBy("r_regionkey").collect().map(_.toSeq).toSeq)
    df.select(concat_ws("|", col("r_regionkey"), col("r_name")).as("value"))
      .write.text(s"$base/t")
    val back = spark.read.text(s"$base/t")
      .select(split(col("value"), "\\|").as("p"))
      .select(col("p").getItem(0).cast("int").as("k"),
        col("p").getItem(1).as("n"))
    assert(back.orderBy("k").as[(Int, String)].collect().toSeq ==
      df.orderBy("r_regionkey").as[(Int, String)].collect().toSeq)
  }

  test("compact rewrites a many-file parquet dir preserving data") {
    val dir = specTempDir("compact").resolve("t").toString
    graft.Tables.orders(spark, sfDir).repartition(24).write.parquet(dir)
    val before = graft.Tables.load(spark, sfDir, "orders").count()
    val (nBefore, nAfter) = Transfer.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore >= 24 && nAfter == 1, s"$nBefore -> $nAfter")
    assert(spark.read.parquet(dir).count() == before)
  }

  test("compact: empty dir is a no-op; stale backup aborts") {
    val empty = specTempDir("compact-empty")
    assert(Transfer.compact(spark, empty.toString) == (0, 0))
    val dir = specTempDir("compact-stale").resolve("t")
    graft.Tables.region(spark, sfDir).write.parquet(dir.toString)
    Files.createDirectory(dir.getParent.resolve("t__compact_bak"))
    intercept[IllegalStateException] {
      Transfer.compact(spark, dir.toString)
    }
  }
}
