package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Completeness contract for the PassJoin-style blocked edit-distance
  * join: on every domain where the naive all-pairs join is affordable,
  * [[Dedup.fuzzyJoinBlocked]] must return EXACTLY its pair set — the
  * blocking may only cut candidates the residual `levenshtein` would
  * reject anyway. Precision is trivially exact (the residual runs on
  * every candidate); these tests pin the dangerous direction,
  * completeness of the segment/window/short-bucket union.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: DataFrame, idCol: String, strCol: String,
      k: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col(idCol).cast("long").as("ka"),
      col(strCol).as("sa"))
    val b = df.select(col(idCol).cast("long").as("kb"),
      col(strCol).as("sb"))
    a.crossJoin(b).filter(col("ka") < col("kb"))
      .withColumn("d", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("d") <= k)
      .select("ka", "kb", "d").as[(Long, Long, Long)].collect().toSet
  }

  private def blocked(df: DataFrame, idCol: String, strCol: String,
      k: Int): Set[(Long, Long, Long)] =
    Dedup.fuzzyJoinBlocked(df, idCol, strCol, k)
      .select("key_a", "key_b", "dist")
      .as[(Long, Long, Long)].collect().toSet

  test("blocked == naive on the bounded star-schema domain (k=3)") {
    val p = graft.Tables.part(spark, sfDir)
      .filter(col("p_partkey") < 400).select("p_partkey", "p_name")
    val want = naive(p, "p_partkey", "p_name", 3)
    val got = blocked(p, "p_partkey", "p_name", 3)
    assert(want.nonEmpty, "fixture must produce pairs or this proves nothing")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("adversarial edit placements: front/middle/tail edits, max " +
    "length skew, short strings — complete for k=1,2,3") {
    // crafted to stress every blocking path: position-window shifts
    // from front inserts, the +-k length band edges, segment-boundary
    // edits, the <=k short bucket, and identical strings
    val strs = Seq(
      "abcdefghij",    // base
      "Xabcdefghij",   // front insert: every segment shifts right
      "abcdefghijXYZ", // +3 length skew, band edge for k=3
      "XYabcdefgh",    // 2 front inserts + 2 tail deletions
      "abcdeghij",     // middle deletion
      "abCdeFghiJ",    // 3 substitutions spread across segments
      "aXbcYdefZghij", // inserts at 3 segment boundaries
      "ab",            // short bucket (<= k for k>=2)
      "ba",            // short transposition = 2 edits
      "abcd",          // exactly k+1 chars for k=3 (1-char segments)
      "abcf",          // 1 edit from abcd
      "zzzzzzzzzz",    // far from everything
      "abcdefghij")    // exact duplicate of the base
    val df = strs.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (k <- 1 to 3) {
      val want = naive(df, "id", "s", k)
      val got = blocked(df, "id", "s", k)
      assert(got == want, s"k=$k missing=${want -- got} extra=${got -- want}")
    }
  }

  test("multiplicity fans back out: repeated names yield every id " +
    "pair, same-name groups at dist 0") {
    val df = Seq(
      (1L, "red bolt"), (2L, "red bolt"), (3L, "red bolt"),
      (4L, "red bole"), (5L, "blue gear")).toDF("id", "s")
    val want = naive(df, "id", "s", 2)
    val got = blocked(df, "id", "s", 2)
    // 3 same-name pairs at d=0, 3x1 cross pairs at d=1 (bolt~bole)
    assert(want.count(_._3 == 0L) == 3 && want.count(_._3 == 1L) == 3)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("name-level pairs are canonical (s_a < s_b) and within " +
    "threshold; rejects maxDist 0") {
    val df = Seq((1L, "abcde"), (2L, "abcdX"), (3L, "abcde"))
      .toDF("id", "s")
    val pairs = Dedup.fuzzyPairsBlocked(df, "s", 1)
      .as[(String, String, Long)].collect().toSeq
    assert(pairs == Seq(("abcdX", "abcde", 1L)), pairs.toString)
    intercept[IllegalArgumentException] {
      Dedup.fuzzyPairsBlocked(df, "s", 0)
    }
  }
}
