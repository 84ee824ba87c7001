package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.ops.PlanChecks
import org.apache.spark.sql.functions._

/** Cross-shard ExactSubstr composition (`dedup_suffix_cross_shard`):
  * the DuckDB oracle hash-grades every byte; this spec pins the
  * PLANTED GEOMETRY independently, so a future fixture or salting
  * change that accidentally stops exercising the cross-shard path
  * fails loudly instead of degenerating into a vacuous green:
  *
  *  - stage 1 (per-shard suffix-array removal) must NOT touch the
  *    planted passage — it occurs once per shard;
  *  - stage 2 (cross-shard token-gram pass) must cut it from the
  *    pair's non-keeper and keep it on the keeper.
  */
class CrossShardSpec extends SparkSpec {
  import spark.implicits._

  test("planted pair geometry: keeper keeps the passage, partner " +
    "loses exactly its 8 tokens to the cross-shard stage") {
    val df = SparkEntry.queries("dedup_suffix_cross_shard")(spark, sfDir)
    PlanChecks.assertNoCartesian(df)
    val rows = df.select("doc_id", "shard", "n_tokens", "n_kept",
        "final_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap

    def xs(k: Long): Seq[String] =
      Seq("a", "b", "c", "d", "e", "f", "g", "h").map(s => s"xs$k$s")

    val plantedPairs = rows.keys.filter(id =>
      id % 40 == 0 && (id / 40) % 2 == 0 && rows.contains(id + 20))
      .toSeq.sorted
    assert(plantedPairs.nonEmpty,
      "fixture must contain at least one complete planted pair")

    plantedPairs.foreach { keeperId =>
      val k = keeperId / 40
      val (_, kShard, _, _, kText) = rows(keeperId)
      val (_, pShard, pTok, pKept, pText) = rows(keeperId + 20)
      assert(kShard != pShard, s"pair $keeperId must straddle shards")
      val kToks = kText.split(" ", -1).toSet
      val pToks = pText.split(" ", -1).toSet
      xs(k).foreach { t =>
        assert(kToks.contains(t),
          s"keeper $keeperId lost planted token $t — stage 1 must " +
            "not remove a once-per-shard passage")
        assert(!pToks.contains(t),
          s"partner ${keeperId + 20} kept planted token $t — the " +
            "cross-shard stage missed it")
      }
      assert(pTok - pKept >= 8,
        s"partner ${keeperId + 20} lost ${pTok - pKept} tokens; " +
          "expected at least the 8 planted ones")
    }

    // odd-k docs are controls: no xs token anywhere near them
    rows.collect { case (id, (_, _, _, _, txt))
        if (id / 40) % 2 == 1 =>
      assert(!txt.split(" ", -1).exists(_.startsWith("xs")),
        s"control doc $id carries a planted token")
    }
  }
}
