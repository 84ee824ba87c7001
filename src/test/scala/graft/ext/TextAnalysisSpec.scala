package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is order-sensitive, stable, and in range") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "")
    ).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    assert(fps.values.forall(f => f >= 0 && f < TextAnalysis.HashPrime))
  }

  test("tokenHash31 matches the md5-derived reference value") {
    // python: int(hashlib.md5(b'hello').hexdigest()[:15], 16) % 2147483647
    val got = Seq("hello").toDF("t")
      .select(TextAnalysis.tokenHash31(col("t"))).as[Long].collect()(0)
    assert(got == 419982666956583591L % 2147483647L)
  }

  test("regexTokens splits words and punctuation BPE-style") {
    val got = Seq("Hello, world! x2").toDF("t")
      .select(TextAnalysis.regexTokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got == Seq("Hello", ",", "world", "!", "x2"))
  }

  test("quality score is in [0,1] and favors diverse long docs") {
    val df = Seq(
      (1L, "the " + (1 to 99).map(i => s"tok$i").mkString(" ")), // diverse
      (2L, Seq.fill(100)("dup").mkString(" "))                   // degenerate
    ).toDF("id", "text")
    val q = df.select(col("id"), TextAnalysis.qualityScore(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0 && v <= 1))
    assert(q(1L) > q(2L))
  }

  test("charNgramProfile yields |s|-n+1 trigrams") {
    val got = Seq("abcd e").toDF("t")
      .select(TextAnalysis.charNgramProfile(col("t"), 3))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("abc", "bcd", "cd_", "d_e"))
  }

  test("langIdHeuristic agrees with stopword ratio on the fixture") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = docs.select(
      TextAnalysis.langIdHeuristic(col("text")).as("pred")).groupBy("pred")
      .count().as[(String, Long)].collect().toMap
    assert(out.values.sum == 500)
    assert(out.keySet.subsetOf(Set("en", "other")))
  }
}
