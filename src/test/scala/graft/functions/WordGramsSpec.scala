package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The built-in composition WordGrams replaces (guarded for short
    * docs) — the differential reference: all n-grams, repeats kept. */
  private def builtin(c: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(c, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  test("differential vs built-in composition on random docs") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val docs = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = docs.select(
        WordGrams(col("text"), n).as("got"), builtin(col("text"), n).as("want"))
        .filter(col("got") =!= col("want"))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("keeps repeats in order (the WordShingles difference)") {
    val got = Seq("x y x y x").toDF("text")
      .select(WordGrams(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("x y", "y x", "x y", "y x"))
    val distinct = Seq("x y x y x").toDF("text")
      .select(WordShingles(col("text"), 2).as("g"))
      .as[Seq[String]].head()
    assert(distinct == Seq("x y", "y x"))
  }

  test("edge cases: empty string, single token, exact length, null") {
    val got = Seq(Some(""), Some("a"), Some("a b c"), None).toDF("text")
      .select(WordGrams(col("text"), 3).as("g"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(got == Seq(Some(Seq()), Some(Seq()), Some(Seq("a b c")), None))
  }
}
