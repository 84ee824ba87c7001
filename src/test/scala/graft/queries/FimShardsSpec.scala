package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** The FIM shard contract (`pipeline_fim_shards`): the DuckDB oracle
  * grades exact values; this spec pins the transformation against an
  * independent reconstruction — character cuts recomputed from the
  * doc_id arithmetic (and shown to PARTITION the document exactly),
  * pieces encoded through the COLUMN encode path, both sentinel
  * layouts reassembled per mode, and the packing offsets refolded. */
class FimShardsSpec extends SparkSpec {
  import spark.implicits._

  test("cuts partition the text; streams match the column encode " +
    "path in both modes; packing offsets refold") {
    val docs = Tables.documents(spark, sfDir)
    val texts = docs.select(col("doc_id"),
        coalesce(col("text"), lit("")).as("t"))
      .as[(Long, String)].collect().toMap
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"), "text"),
      12)
    val vocab = Bpe.idVocabWithSpecials(merges, Bpe.FimSpecials)

    // independent cuts + piece contents (ASCII fixture: Java char
    // positions equal engine code-point positions)
    val pieces = texts.toSeq.flatMap { case (id, t) =>
      val L = t.length.toLong
      val u = (7919L * id) % (L + 1)
      val v = (104729L * id) % (L + 1)
      val (lo, hi) = (math.min(u, v).toInt, math.max(u, v).toInt)
      val (pre, mid, suf) =
        (t.substring(0, lo), t.substring(lo, hi), t.substring(hi))
      assert(pre + mid + suf == t, s"doc $id cuts do not partition")
      Seq((id * 3, pre), (id * 3 + 1, mid), (id * 3 + 2, suf))
    }
    val encoded: Map[Long, Vector[Long]] =
      Bpe.encodeBytes(pieces.toDF("k", "content"), "k", "content",
          merges)
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).map(vocab).toVector)
        .toMap

    val rows = SparkEntry.queries("pipeline_fim_shards")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getString(9), r.getLong(10),
        r.getLong(11)))
      .sortBy(_._1)
    assert(rows.length == texts.size)
    assert(rows.exists(_._2 == "psm") && rows.exists(_._2 == "spm"))

    var running = 0L
    rows.foreach { case (id, mode, lo, hi, nPre, nMid, nSuf, nTok,
        idSum, head, off, bin) =>
      val pre = encoded(id * 3)
      val mid = encoded(id * 3 + 1)
      val suf = encoded(id * 3 + 2)
      val ids =
        if (mode == "psm")
          Vector(Sft.BosId, Sft.FimPreId) ++ pre ++
            (Sft.FimSufId +: suf) ++ (Sft.FimMidId +: mid) :+ Sft.EosId
        else
          Vector(Sft.BosId, Sft.FimSufId) ++ suf ++
            (Sft.FimPreId +: pre) ++ (Sft.FimMidId +: mid) :+ Sft.EosId
      assert(mode == (if (id % 2 == 0) "psm" else "spm"))
      assert(nPre == pre.size && nMid == mid.size && nSuf == suf.size,
        s"doc $id piece counts")
      assert(nTok == ids.size.toLong && idSum == ids.sum &&
        head == ids.take(3).mkString("|"), s"doc $id stream")
      // the transform drops nothing: piece tokens + 5 sentinels
      assert(nTok == nPre + nMid + nSuf + 5)
      assert(off == running && bin == off / 512L, s"doc $id packing")
      running += nTok
    }
  }
}
