package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The ExactSubstr freeze contract (`pipeline_freeze_exact`): the
  * DuckDB oracle replays the whole chain via the gram-interval
  * equivalence; this spec pins the FREEZE SET independently — gate,
  * repeated-20-gram coverage removal, keeper resolution and the
  * manifest's membership columns are recomputed in plain in-memory
  * Scala (no Spark, no suffix array, no SQL) and must agree with the
  * query's manifest on every shard's doc count, checksum and epoch
  * endpoints. A span boundary off by one character changes a cleaned
  * document and flips its checksum. (Fixture is ASCII, so Java char
  * positions equal the engine's code-point positions.)
  */
class FreezeExactSpec extends SparkSpec {
  import spark.implicits._

  test("freeze set differential: in-memory gate + gram-coverage " +
    "removal + keeper resolution reproduce the manifest membership") {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("source") === "src0")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)].collect().toSeq

    // gate: badword rate (split keeps empties — Spark split semantics)
    val gated = docs.filter { case (_, t) =>
      val toks = t.split(" ", -1)
      toks.count(w => w == "slow" || w == "big") * 1000 <=
        100 * toks.length
    }
    // repeated-20-gram coverage across the whole gated shard (an
    // occurrence is a (doc, offset) position — two in ONE doc repeat)
    val occ = mutable.Map.empty[String, List[(Long, Int)]]
    gated.foreach { case (id, t) =>
      var i = 0
      while (i <= t.length - 20) {
        val g = t.substring(i, i + 20)
        occ(g) = (id, i) :: occ.getOrElse(g, Nil)
        i += 1
      }
    }
    val cov = mutable.Set.empty[(Long, Int)]
    occ.valuesIterator.filter(_.lengthCompare(2) >= 0).foreach(
      _.foreach { case (id, p) =>
        var o = 0
        while (o < 20) { cov += ((id, p + o)); o += 1 }
      })
    val cleaned = gated
      .map { case (id, t) =>
        (id, t.indices.filterNot(j => cov((id, j))).map(t.charAt).mkString)
      }
      .filter(_._2.nonEmpty)
    assert(cleaned.size < gated.size,
      "fixture must contain duplicated spans (removal must bite)")
    // keeper: min doc_id per cleaned text
    val frozen = cleaned.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }
    assert(frozen.nonEmpty)

    def h(s: String): Long = TextAnalysis.tokenHash31Local(s)
    val expected = frozen.toSeq
      .map { case (id, t) =>
        val hh = h(s"$id#freeze-x")
        (hh % 4, id, hh * 10000000L + id % 10000000L, h(s"$id|$t"))
      }
      .groupBy(_._1)
      .map { case (shard, g) =>
        (shard, g.size.toLong, g.map(_._4).sum,
          g.minBy(_._3)._2, g.maxBy(_._3)._2)
      }.toSet

    val got = SparkEntry.queries("pipeline_freeze_exact")(spark, sfDir)
      .select(col("shard_id"), col("n_docs"), col("checksum"),
        col("first_doc"), col("last_doc"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("plan contract: the freeze tail is keyed end to end — no " +
    "cartesian between the cleaned corpus and the shard manifest") {
    graft.ops.PlanChecks.assertNoCartesian(
      SparkEntry.queries("pipeline_freeze_exact")(spark, sfDir))
  }
}
