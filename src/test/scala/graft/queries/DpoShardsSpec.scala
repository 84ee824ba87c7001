package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** The DPO shard contract (`pipeline_dpo_shards`): the DuckDB oracle
  * grades exact values; this spec pins the composition differentially
  * — the pair set must equal the GRADED pairing query's output
  * (`train_dpo_pairs` is the contract for verdicts and margins), and
  * every stream column must match an independently assembled pair of
  * branches built through the COLUMN encode path (`Bpe.encodeBytes`,
  * the literal-replace twin of the scalable encoder the query uses)
  * with the scaffold arithmetic checked pairwise (both branches share
  * the exact prompt prefix; masks never train the prompt). */
class DpoShardsSpec extends SparkSpec {
  import spark.implicits._

  test("pair set equals train_dpo_pairs; streams match the column " +
    "encode path; branch/scaffold arithmetic consistent") {
    val rows = SparkEntry.queries("pipeline_dpo_shards")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getString(9), r.getLong(10),
        r.getLong(11), r.getLong(12), r.getString(13)))
    assert(rows.nonEmpty)

    // (a) pairing differential vs the graded pairing query
    val wantPairs = SparkEntry.queries("train_dpo_pairs")(spark, sfDir)
      .select(col("source"), col("chosen_id"), col("rejected_id"),
        col("margin").cast("long"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSet == wantPairs)

    // (b) independent streams through the column encode path
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"), "text"),
      12)
    val vocab = Bpe.idVocabWithSpecials(merges)
    val texts = docs.select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)].collect().toMap
    def first8(t: String): String =
      t.split(" ").filter(_.nonEmpty).take(8).mkString(" ")
    val contents = rows.flatMap { r =>
      Seq((r._2 * 3, s"${r._1} q${r._2 + r._3}"),
        (r._2 * 3 + 1, first8(texts(r._2))),
        (r._2 * 3 + 2, first8(texts(r._3))))
    }.toSeq
    val encoded: Map[Long, Vector[Long]] =
      Bpe.encodeBytes(contents.toDF("k", "content"), "k", "content",
          merges)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).map(vocab).toVector)
        .toMap

    rows.foreach { case (_, cid, rid, _, pLen, pSum, cLen, cTrain,
        cSum, cHead, rLen, rTrain, rSum, rHead) =>
      val pp = encoded(cid * 3)
      val cs = encoded(cid * 3 + 1)
      val rs = encoded(cid * 3 + 2)
      def branch(content: Vector[Long]): Vector[Long] =
        Vector(Sft.BosId, Sft.UserId) ++ pp ++
          Vector(Sft.EosId, Sft.AsstId) ++ content :+ Sft.EosId
      val cb = branch(cs)
      val rb = branch(rs)
      assert(pLen == pp.size.toLong && pSum == pp.sum,
        s"pair ($cid,$rid) prompt")
      assert(cLen == cb.size.toLong && cSum == cb.sum &&
        cTrain == cs.size + 1L &&
        cHead == cb.take(3).mkString("|"), s"pair ($cid,$rid) chosen")
      assert(rLen == rb.size.toLong && rSum == rb.sum &&
        rTrain == rs.size + 1L &&
        rHead == rb.take(3).mkString("|"), s"pair ($cid,$rid) rejected")
      // scaffold arithmetic: 4 untrained scaffold tokens + prompt on
      // both branches; the shared prefix is prompt_len + 4 long
      assert(cLen == pLen + cTrain + 4 && rLen == pLen + rTrain + 4)
      assert(cb.take(pp.size + 4) == rb.take(pp.size + 4),
        s"pair ($cid,$rid) branches diverge inside the shared prompt")
    }
  }
}
