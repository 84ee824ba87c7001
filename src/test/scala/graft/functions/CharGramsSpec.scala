package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharGramsSpec extends SparkSpec {
  import spark.implicits._

  /** The built-in composition CharGrams replaces — the differential
    * reference (O(len²): substring at a dynamic position re-walks the
    * string; see SCALE.md round-8 notes). */
  private def builtin(c: org.apache.spark.sql.Column, n: Int) =
    when(length(c) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), length(c) - n),
        i => substring(c, lit(1) + i, lit(n))))

  test("differential vs built-in composition, incl. supplementary " +
    "code points (substring counts code points, not UTF-16 chars)") {
    val docs = Seq(
      (1L, "abcdef"),
      (2L, "ab"),                      // shorter than any n >= 3
      (3L, ""),
      (4L, "aaa"),
      (5L, "héllo wörld"),             // 2-byte UTF-8
      (6L, "日本語のテキスト"),          // 3-byte UTF-8
      (7L, "a😀b😁c"), // emoji = surrogate pairs
      (8L, "x" * 500)
    ).toDF("id", "t")
    for (n <- Seq(1, 2, 3, 5)) {
      val diff = docs.select(col("id"),
          CharGrams(col("t"), n).as("got"),
          builtin(col("t"), n).as("want"))
        .filter(col("got") =!= col("want"))
        .collect()
      assert(diff.isEmpty, s"n=$n: ${diff.mkString(", ")}")
    }
  }

  test("positional order and exact window contents") {
    val got = Seq(Tuple1("abcd")).toDF("t")
      .select(CharGrams(col("t"), 2)).as[Seq[String]].head()
    assert(got == Seq("ab", "bc", "cd"))
  }
}
