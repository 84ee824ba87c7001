package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomPrune contract: the pruned join returns EXACTLY the plain join
  * (false positives are removed by the real join; false negatives are
  * impossible by Bloom guarantee), and the pre-filter genuinely drops
  * non-joining fact rows before the exchange.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join equals plain join on the star schema") {
    val dim = graft.Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val fact = graft.Tables.orders(spark, sfDir)
    val got = BloomPrune
      .prunedEquiJoin(fact, dim, "o_custkey", "c_custkey")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
      .collect().toSeq
    val want = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
      .collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("bloom pre-filter prunes non-joining fact rows") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = (1L to 10000L).toDF("fk")
    val bloom = dim.stat.bloomFilter("k", 3, 0.01)
    val kept = fact.filter(udf((k: Long) => bloom.mightContainLong(k))
      .apply(col("fk"))).count()
    // 3 true keys + ~1% fpp of the other 9997
    assert(kept >= 3 && kept < 500, s"kept=$kept")
  }

  test("probe is the codegen'd Catalyst expression — no ScalaUDF " +
    "island in the executed plan") {
    val dim = graft.Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val fact = graft.Tables.orders(spark, sfDir)
    val plan = PlanChecks.executedPlan(
      BloomPrune.prunedEquiJoin(fact, dim, "o_custkey", "c_custkey"))
    assert(!plan.contains("ScalaUDF"),
      s"bloom probe must not box rows through a UDF\n$plan")
    assert(plan.contains("might_contain"),
      s"expected Catalyst BloomFilterMightContain probe\n$plan")
  }

  test("empty dim side yields an empty join, not a failure") {
    val dim = Seq.empty[Long].toDF("k")
    val fact = Seq(1L, 2L).toDF("fk")
    assert(BloomPrune.prunedEquiJoin(fact, dim, "fk", "k").count() == 0)
  }

  test("rejects non-integral keys loudly") {
    val dim = Seq("a").toDF("k")
    val fact = Seq("a", "b").toDF("fk")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prunedEquiJoin(fact, dim, "fk", "k")
    }
    assert(e.getMessage.contains("integral"))
  }
}
