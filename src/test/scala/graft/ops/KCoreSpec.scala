package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def coreMap(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 16): Map[Long, Long] =
    KCore.core(edges.toDF("a", "b"), "a", "b", k, maxRounds)
      .as[(Long, Long)].collect().toMap

  test("K4 is its own 3-core; a pendant vertex peels off") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(coreMap(k4, 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // pendant 5 hangs off the clique: gone at k=3, clique untouched
    assert(coreMap(k4 :+ (4L, 5L), 3) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a path has an empty 2-core (cascading peel, one layer a round)") {
    val path = (1L until 8L).map(i => (i, i + 1))
    assert(coreMap(path, 2).isEmpty)
    // ...and a cycle IS its own 2-core
    val cycle = path :+ (8L, 1L)
    assert(coreMap(cycle, 2) == (1L to 8L).map(_ -> 2L).toMap)
  }

  test("two cliques sharing one bridge: both 3-cores survive; the " +
    "bridge edge stays because BOTH endpoints are core members") {
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c2 = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val got = coreMap(c1 ++ c2 :+ (4L, 5L), 3)
    // the k-core is the maximal INDUCED subgraph: every edge among
    // surviving vertices counts, so the bridge endpoints carry deg 4
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L,
      5L -> 4L, 6L -> 3L, 7L -> 3L, 8L -> 3L), got.toString)
  }

  test("a graph needing exactly maxRounds peels converges — the " +
    "confirmation round does not consume a productive iteration") {
    // an 8-vertex path peels its two endpoints each round: exactly 4
    // productive rounds to empty, so maxRounds = 4 must succeed (the
    // no-change confirmation runs as iteration 5)
    val path8 = (1L until 8L).map(i => (i, i + 1))
    assert(coreMap(path8, 2, maxRounds = 4).isEmpty)
    // ...and 3 is genuinely insufficient
    intercept[IllegalArgumentException] {
      coreMap(path8, 2, maxRounds = 3)
    }
  }

  test("forced distributed loop equals the driver peel leg, values, " +
    "schema and round budget") {
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c2 = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val g = c1 ++ c2 :+ (4L, 5L)
    val path8 = (1L until 8L).map(i => (i, i + 1))
    val localGot = coreMap(g, 3)
    val localSchema = KCore.core(g.toDF("a", "b"), "a", "b", 3).schema
    spark.conf.set("spark.graft.kcore.localMaxEdges", "0")
    try {
      assert(coreMap(g, 3) == localGot,
        "distributed and local legs must agree on the core")
      assert(KCore.core(g.toDF("a", "b"), "a", "b", 3).schema
        == localSchema,
        "the two legs must expose identical output schemas")
      // the round-budget contract must hold identically on both legs
      assert(coreMap(path8, 2, maxRounds = 4).isEmpty)
      intercept[IllegalArgumentException] {
        coreMap(path8, 2, maxRounds = 3)
      }
    } finally spark.conf.unset("spark.graft.kcore.localMaxEdges")
  }

  test("insufficient round budget fails loudly instead of returning a " +
    "partial peel") {
    val longPath = (1L until 40L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      coreMap(longPath, 2, maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
