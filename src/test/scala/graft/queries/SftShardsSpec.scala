package graft.queries

import graft.{SparkSpec, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** The SFT shard contract (`pipeline_sft_shards`): the DuckDB oracle
  * grades exact values; this spec pins (a) the template/mask algebra,
  * (b) the reserved-id layout, and (c) MASK/ID ALIGNMENT ACROSS
  * CHUNK BOUNDARIES — every piece's mask sum, id sum and head ids are
  * compared against an independently assembled conversation stream
  * built through the COLUMN encode path (`Bpe.encodeBytes`, the
  * literal-replace twin of the scalable encoder the query uses), so a
  * drifted slice offset anywhere fails with a named piece. */
class SftShardsSpec extends SparkSpec {

  private val Ctx = 256L

  test("template render: mask trains assistant content and closing " +
    "EOS only; conversation starts with one unmasked BOS") {
    val (aIds, aMsk) = Sft.renderMessage(Seq(10L, 11L), assistant = true)
    assert(aIds == Seq(Sft.AsstId, 10L, 11L, Sft.EosId))
    assert(aMsk == Seq(0L, 1L, 1L, 1L))
    val (uIds, uMsk) = Sft.renderMessage(Seq(12L), assistant = false)
    assert(uIds == Seq(Sft.UserId, 12L, Sft.EosId))
    assert(uMsk == Seq(0L, 0L, 0L))
    // empty content still carries the template skeleton
    val (eIds, eMsk) = Sft.renderMessage(Nil, assistant = true)
    assert(eIds == Seq(Sft.AsstId, Sft.EosId) && eMsk == Seq(0L, 1L))
    val (cIds, cMsk) =
      Sft.assembleConversation(Seq((uIds, uMsk), (aIds, aMsk)))
    assert(cIds == Sft.BosId +: (uIds ++ aIds))
    assert(cMsk == 0L +: (uMsk ++ aMsk))
  }

  test("idVocabWithSpecials: specials dense at 0..n-1, bytes and " +
    "products shifted, first-rank rule preserved") {
    val merges = Seq(Bpe.Merge(1, "a", "b", 5L), Bpe.Merge(2, "ab", "c", 3L))
    val v = Bpe.idVocabWithSpecials(merges)
    Bpe.SftSpecials.zipWithIndex.foreach { case (t, i) =>
      assert(v(t) == i.toLong, s"special $t")
    }
    assert(v("a") == 6L + 'a'.toLong)
    assert(v("ab") == 6L + 255L + 1L)
    assert(v("abc") == 6L + 255L + 2L)
    assert(v.values.toSeq.distinct.size == v.size, "ids not distinct")
  }

  test("sft shards: window tiling, BOS at stream starts, mask/id " +
    "alignment across chunk boundaries") {
    // ---- independent ground truth: per-conversation (ids, mask)
    // streams through the COLUMN encode path ----
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"), "text"),
      12)
    val vocab = Bpe.idVocabWithSpecials(merges)
    val msgs = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ((col("doc_id") % 5) + 1).cast("int"))).as("i"))
      .select((col("doc_id") * 8 + col("i")).as("k"),
        coalesce(array_join(slice(
          filter(split(coalesce(col("text"), lit("")), " "),
            w => length(w) > 0),
          (col("i") * 4 + 1).cast("int"), lit(4)), " "), lit(""))
          .as("content"))
    val streams: Map[Long, (Vector[Long], Vector[Long])] =
      Bpe.encodeBytes(msgs, "k", "content", merges).collect()
        .map { r =>
          (r.getLong(0), r.getSeq[String](1).map(vocab).toVector)
        }
        .groupBy(_._1 / 8)
        .map { case (doc, ms) =>
          val rendered = ms.sortBy(_._1 % 8).toSeq.map { case (k, cids) =>
            Sft.renderMessage(cids, assistant = (k % 8) % 2 == 1)
          }
          val (ids, msk) = Sft.assembleConversation(rendered)
          doc -> (ids.toVector, msk.toVector)
        }

    // ---- the query's pieces ----
    val rows = SftQueries.defs.find(_.name == "pipeline_sft_shards").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7)))
    assert(rows.nonEmpty)

    // windows tile: dense seg ids, contiguous pieces, full fill
    val byChunk = rows.groupBy(_._1)
    val maxChunk = byChunk.keys.max
    assert(maxChunk >= 1L, "fixture must span multiple windows")
    byChunk.foreach { case (c, ps) =>
      val sorted = ps.sortBy(_._4)
      assert(sorted.map(_._2).toSeq == (1L to ps.length).toSeq,
        s"chunk $c seg ids not dense")
      sorted.foldLeft(0L) { case (expect, p) =>
        assert(p._4 == expect, s"chunk $c gap at ${p._4}")
        p._4 + p._5
      }
      val fill = ps.map(_._5).sum
      if (c < maxChunk) assert(fill == Ctx, s"chunk $c fill $fill")
      else assert(fill <= Ctx)
    }

    // per document: pieces in ascending chunk order are the stream's
    // consecutive slices; every piece's mask sum / id sum / head must
    // match the ground-truth slice at its cumulative offset
    rows.groupBy(_._3).foreach { case (doc, ps) =>
      val (ids, msk) = streams(doc)
      val sorted = ps.sortBy(_._1)
      // continuation pieces start at the window's first slot
      sorted.drop(1).foreach(p =>
        assert(p._4 == 0L, s"doc $doc continuation at ${p._4}"))
      // non-final pieces end at the window's last slot
      sorted.dropRight(1).foreach(p =>
        assert(p._4 + p._5 == Ctx, s"doc $doc piece not flush"))
      // chunks consecutive — a document cannot skip a window
      sorted.map(_._1).sliding(2).foreach {
        case Array(a, b) => assert(b == a + 1, s"doc $doc skips window")
        case _ => ()
      }
      val total = sorted.foldLeft(0L) {
        case (off, (_, _, _, _, plen, train, idSum, head)) =>
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
      // the stream's first piece leads with the conversation BOS
      assert(sorted.head._8.split('|').head.toLong == Sft.BosId)
    }
  }

  test("sft windows: the export view is exactly the fold of the " +
    "pieces view; PAD only ever completes the last window") {
    val pieces = SftQueries.defs.find(_.name == "pipeline_sft_shards")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val folded = pieces.groupBy(_._1).map { case (c, ps) =>
      (c, ps.length.toLong, ps.map(_._3).sum, Ctx - ps.map(_._3).sum,
        ps.map(_._4).sum, ps.map(_._5).sum,
        ps.map(_._2).min, ps.map(_._2).max)
    }.toSet
    val windows = SftQueries.defs.find(_.name == "pipeline_sft_windows")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(windows.toSet == folded)
    val maxChunk = windows.map(_._1).max
    windows.foreach { w =>
      if (w._1 < maxChunk)
        assert(w._4 == 0L, s"interior window ${w._1} leaks pad ${w._4}")
      else assert(w._4 >= 0L && w._4 < Ctx)
    }
  }
}
