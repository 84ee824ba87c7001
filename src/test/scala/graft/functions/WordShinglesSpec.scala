package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The built-in composition WordShingles replaces (guarded for short
    * docs) — the differential reference. */
  private def builtin(c: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(c, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  test("differential vs built-in composition on random docs") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val docs = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    for (n <- Seq(2, 3, 5)) {
      val diff = docs.select(
        WordShingles(col("text"), n).as("got"), builtin(col("text"), n).as("want"))
        .filter(col("got") =!= col("want"))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("edge cases: empty string, single token, exact length, null") {
    val df = Seq(Some(""), Some("a"), Some("a b c"), None)
      .toDF("text")
    val got = df.select(WordShingles(col("text"), 3).as("s"))
      .as[Option[Seq[String]]].collect().toSeq
    // "" splits to [""] (one empty token) => shorter than 3 => []
    assert(got == Seq(Some(Seq()), Some(Seq()), Some(Seq("a b c")), None))
  }

  test("duplicates collapse, first-occurrence order") {
    val got = Seq("x y x y x").toDF("text")
      .select(WordShingles(col("text"), 2).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("x y", "y x"))
  }

  test("stays inside whole-stage codegen") {
    val df = Seq("a b c d").toDF("text")
      .select(explode(WordShingles(col("text"), 2)))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Generate explode(word_shingles"))
  }
}
