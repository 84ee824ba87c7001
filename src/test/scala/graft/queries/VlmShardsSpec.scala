package graft.queries

import graft.{SparkSpec, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** The VLM shard contract (`pipeline_vlm_shards`): the DuckDB oracle
  * grades exact values; this spec pins (a) the image-message template
  * (patch placeholders mask-0 inside a user turn), (b) the EXTENDED
  * reserved-id layout (`Bpe.VlmSpecials`: text-only ids 0..5
  * unchanged, `<|image|>` = 6, learned offset 7), and (c) mask/id
  * alignment across chunk boundaries against an independently
  * assembled interleaved stream built through the COLUMN encode path
  * with patch budgets from the synthesis arithmetic — the query's
  * budgets come OUT of the container bytes, so a dim mis-parse also
  * fails here with a named document. */
class VlmShardsSpec extends SparkSpec {

  private val Ctx = 256L

  test("image message template: placeholders mask-0 inside a user " +
    "turn; caption turn trains content + closing EOS") {
    val (uIds, uMsk) =
      Sft.renderMessage(Seq.fill(3)(Sft.ImgId), assistant = false)
    assert(uIds == Seq(Sft.UserId, 6L, 6L, 6L, Sft.EosId))
    assert(uMsk == Seq(0L, 0L, 0L, 0L, 0L))
    val (aIds, aMsk) = Sft.renderMessage(Seq(10L), assistant = true)
    val (cIds, cMsk) =
      Sft.assembleConversation(Seq((uIds, uMsk), (aIds, aMsk)))
    assert(cIds == Seq(Sft.BosId, Sft.UserId, 6L, 6L, 6L, Sft.EosId,
      Sft.AsstId, 10L, Sft.EosId))
    assert(cMsk == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 1L))
  }

  test("VlmSpecials layout: text-only prefix unchanged, image id 6, " +
    "learned ids shifted by 7") {
    val merges = Seq(Bpe.Merge(1, "a", "b", 5L))
    val v = Bpe.idVocabWithSpecials(merges, Bpe.VlmSpecials)
    Bpe.SftSpecials.zipWithIndex.foreach { case (t, i) =>
      assert(v(t) == i.toLong, s"special $t moved")
    }
    assert(v("<|image|>") == Sft.ImgId)
    assert(v("a") == 7L + 'a'.toLong)
    assert(v("ab") == 7L + 255L + 1L)
    assert(v.values.toSeq.distinct.size == v.size)
  }

  test("vlm shards: window tiling and mask/id alignment across " +
    "chunk boundaries vs an independent interleaved stream") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"), "text"),
      12)
    val vocab = Bpe.idVocabWithSpecials(merges, Bpe.VlmSpecials)
    // ground truth: patch budgets from the SYNTHESIS arithmetic (the
    // query must recover the same dims from the container bytes)
    val streams: Map[Long, (Vector[Long], Vector[Long])] =
      Bpe.encodeBytes(
          docs.select(col("doc_id"),
            coalesce(col("text"), lit("")).as("text")),
          "doc_id", "text", merges)
        .collect()
        .map { r =>
          val doc = r.getLong(0)
          val content = r.getSeq[String](1).map(vocab).toVector
          val w = doc % 200 + 1
          val h = doc % 100 + 1
          val patches = ((w + 13) / 14) * ((h + 13) / 14)
          val (ids, msk) = Sft.assembleConversation(Seq(
            Sft.renderMessage(Seq.fill(patches.toInt)(Sft.ImgId),
              assistant = false),
            Sft.renderMessage(content, assistant = true)))
          doc -> (ids.toVector, msk.toVector)
        }.toMap

    val rows = VlmQueries.defs.find(_.name == "pipeline_vlm_shards").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getString(8)))
    assert(rows.nonEmpty)

    // windows tile: dense seg ids, contiguous pieces, full fill
    val byChunk = rows.groupBy(_._1)
    val maxChunk = byChunk.keys.max
    assert(maxChunk >= 1L, "fixture must span multiple windows")
    byChunk.foreach { case (c, ps) =>
      val sorted = ps.sortBy(_._5)
      assert(sorted.map(_._2).toSeq == (1L to ps.length).toSeq,
        s"chunk $c seg ids not dense")
      sorted.foldLeft(0L) { case (expect, p) =>
        assert(p._5 == expect, s"chunk $c gap at ${p._5}")
        p._5 + p._6
      }
      val fill = ps.map(_._6).sum
      if (c < maxChunk) assert(fill == Ctx, s"chunk $c fill $fill")
      else assert(fill <= Ctx)
    }

    // per document: patch budget correct on every piece; pieces are
    // the stream's consecutive slices with matching mask/id sums
    rows.groupBy(_._3).foreach { case (doc, ps) =>
      val (ids, msk) = streams(doc)
      val w = doc % 200 + 1
      val h = doc % 100 + 1
      val patches = ((w + 13) / 14) * ((h + 13) / 14)
      ps.foreach(p => assert(p._4 == patches,
        s"doc $doc n_patches ${p._4} != $patches"))
      val sorted = ps.sortBy(_._1)
      sorted.drop(1).foreach(p =>
        assert(p._5 == 0L, s"doc $doc continuation at ${p._5}"))
      sorted.dropRight(1).foreach(p =>
        assert(p._5 + p._6 == Ctx, s"doc $doc piece not flush"))
      val total = sorted.foldLeft(0L) {
        case (off, (_, _, _, _, _, plen, train, idSum, head)) =>
          val sIds = ids.slice(off.toInt, (off + plen).toInt)
          val sMsk = msk.slice(off.toInt, (off + plen).toInt)
          assert(sMsk.sum == train,
            s"doc $doc off $off mask sum ${sMsk.sum} != $train")
          assert(sIds.sum == idSum,
            s"doc $doc off $off id sum ${sIds.sum} != $idSum")
          assert(sIds.take(3).mkString("|") == head,
            s"doc $doc off $off head mismatch")
          off + plen
      }
      assert(total == ids.size.toLong, s"doc $doc pieces != stream")
      assert(sorted.head._9.split('|').head.toLong == Sft.BosId)
      // the image span never trains: pieces covering only the image
      // prefix (local offsets < 2 + patches skipping BOS/USER) have
      // train_tokens bounded by the caption+EOS mass
      assert(ps.map(_._7).sum == msk.sum, s"doc $doc trained mass")
    }
  }
}
