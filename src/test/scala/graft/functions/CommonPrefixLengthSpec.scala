package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CommonPrefixLengthSpec extends SparkSpec {
  import spark.implicits._

  /** The built-in composition CommonPrefixLength replaces — the
    * differential reference (prefix equality is downward closed, so
    * the filter count IS the maximal equal prefix; O(n²) char work).
    * Guarded for empty inputs: Spark's sequence(1, 0) is the
    * DESCENDING [1, 0], so the unguarded composition would count the
    * vacuous i=0 window — a domain the SuffixArray call site never
    * hits (its substrings are >= 1 char or null). */
  private def builtin =
    expr("CASE WHEN length(__a) = 0 OR length(__b) = 0 THEN 0L ELSE" +
      " CAST(size(filter(sequence(1, least(length(__a)," +
      " length(__b))), i ->" +
      " substring(__a, 1, i) = substring(__b, 1, i))) AS BIGINT) END")

  test("differential vs built-in composition, incl. multi-byte and " +
    "supplementary code points") {
    val pairs = Seq(
      ("abcdef", "abcxyz"),
      ("abc", "abc"),
      ("abc", "abcdef"),
      ("abcdef", "abc"),
      ("", "abc"),
      ("abc", ""),
      ("", ""),
      ("xyz", "abc"),
      ("héllo", "héllp"),            // diverge after 2-byte char
      ("héllo", "hèllo"),            // 2-byte chars sharing a lead byte
      ("日本語のテキスト", "日本語のテスト"), // 3-byte UTF-8
      ("a😀b", "a😀c"),              // 4-byte emoji kept whole
      ("a😀", "a😁"),                // emoji sharing 3 of 4 bytes
      ("𝄞music", "𝄞muse"),          // leading supplementary char
      ("a" * 400 + "x", "a" * 400 + "y"),
      ("a" * 50, "a" * 500)
    ).toDF("__a", "__b")
    val diff = pairs.select(col("__a"), col("__b"),
        CommonPrefixLength(col("__a"), col("__b")).as("got"),
        builtin.as("want"))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(diff.isEmpty, diff.mkString(", "))
  }

  test("exact values on known cases") {
    val got = Seq(("abcd", "abxy"), ("héllo", "hèllo"), ("a😀", "a😁"))
      .toDF("__a", "__b")
      .select(CommonPrefixLength(col("__a"), col("__b")))
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 1L, 1L))
  }

  test("null propagates (binary null-safe eval)") {
    val got = Seq((Some("ab"), None: Option[String]),
        (None: Option[String], Some("ab")),
        (Some("ab"), Some("ab")))
      .toDF("__a", "__b")
      .select(CommonPrefixLength(col("__a"), col("__b")))
      .collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) &&
      got(2).getLong(0) == 2L)
  }
}
