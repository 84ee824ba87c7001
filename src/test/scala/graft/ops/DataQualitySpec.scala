package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkRows: one scan, nulls violate unless exempted") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (-2L, "b"),
      (null, "c")).toDF("v", "tag")
    val rows = DataQuality.checkRows(df, Seq(
        DataQuality.RowRule("v_positive", col("v") > 0),
        DataQuality.RowRule("v_positive_or_null",
          col("v").isNull || col("v") > 0)))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("v_positive") == ((2L, 3L)), "null counts as violation")
    assert(rows("v_positive_or_null") == ((1L, 3L)), "explicit exemption")
  }

  test("uniqueKey counts every row beyond the first per key") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val got = DataQuality.uniqueKey(df, "k_unique", Seq("k"))
      .as[(String, Long, Long)].collect().head
    assert(got == (("k_unique", 3L, 6L)), got.toString)
  }

  test("referential counts orphan child rows (with multiplicity)") {
    val child = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = DataQuality.referential(child, "fk", parent, "pk", "fk_ok")
      .as[(String, Long, Long)].collect().head
    assert(got == (("fk_ok", 3L, 6L)), got.toString)
  }

  test("tableDiff: identical tables produce no rows; a value edit and " +
    "a dropped row each surface exactly their bucket") {
    val a = (1L to 100L).map(k => (k, k * 10)).toDF("k", "v")
    val h = graft.ext.TextAnalysis.tokenHash31(
      concat(col("k").cast("string"), lit("|"), col("v").cast("string")))
    assert(DataQuality.tableDiff(a, a, "k", h, buckets = 16).count() == 0)
    // edit k=5 (bucket 5), drop k=20 (bucket 4)
    val b = (1L to 100L).filter(_ != 20L)
      .map(k => (k, if (k == 5L) 999L else k * 10)).toDF("k", "v")
    val diff = DataQuality.tableDiff(a, b, "k", h, buckets = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(diff.keySet == Set(4L, 5L), diff.toString)
    assert(diff(4L)._2 == diff(4L)._3 + 1, "dropped row: count mismatch")
    assert(diff(5L)._2 == diff(5L)._3 && diff(5L)._4 != diff(5L)._5,
      "edited row: counts equal, hashes differ")
  }

  test("skewReport: hottest keys first, shares and uniform-ratio exact") {
    // key "hot" 60 rows, "warm" 30, ten singles -> total 100, 12 keys
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"k$i")
    val got = DataQuality.skewReport(rows.toDF("k"), "k", topN = 3)
      .orderBy("rnk").as[(Long, String, Long, Long, Long)].collect()
    assert(got.map(_._2).toSeq == Seq("hot", "warm", "k1"))
    val hot = got(0)
    assert(hot._3 == 60L && hot._4 == 600000L, hot.toString)
    // skew vs uniform: 60 * 12 / 100 = 7.2x
    assert(hot._5 == 7200000L, hot.toString)
    // a perfectly uniform key sits at 1e6 * 12/100 * 10 ... = single
    // row keys: 1 * 12 / 100 = 0.12x
    assert(got(2)._5 == 120000L, got(2).toString)
  }

  test("profile: one pass yields nulls, string-identity min/max, exact " +
    "distinct below k; all-null columns still profile") {
    val df = Seq(
      (1L, "b", Option("x")), (2L, "a", None), (3L, "a", None))
      .toDF("id", "tag", "maybe")
      .withColumn("always_null", lit(null).cast("string"))
    val got = DataQuality.profile(df,
        Seq("id", "tag", "maybe", "always_null"), k = 8)
      .as[(String, Long, Long, Option[String], Option[String], Long,
        Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 3L, 0L, Some("1"), Some("3"), 3L,
      got("id")._7, 3.0)), got("id").toString)
    assert(got("tag")._3 == 0L && got("tag")._4 == Some("a") &&
      got("tag")._5 == Some("b") && got("tag")._8 == 2.0)
    assert(got("maybe")._3 == 2L && got("maybe")._8 == 1.0)
    assert(got("always_null") == (("always_null", 3L, 3L, None, None,
      0L, -1L, 0.0)), got("always_null").toString)
  }
}
