package graft.queries

import graft.{SparkSpec, Tables}
import graft.ext.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** The tool-call shard contract (`pipeline_tool_shards`): the DuckDB
  * oracle grades exact values; this spec pins (a) the tool-turn
  * template/mask algebra, (b) the [[Bpe.ToolSpecials]] id layout and
  * extension discipline, and (c) MASK/ID ALIGNMENT ACROSS WINDOW
  * BOUNDARIES via an independently assembled ground truth through the
  * COLUMN encode path — the `SftShardsSpec` rigor applied to the
  * fifth family. */
class ToolShardsSpec extends SparkSpec {

  private val Ctx = 256L

  test("tool turns: call trains its serialized tokens + EOS under a " +
    "0-masked scaffold; results never train; specials extend 0..5") {
    val (cIds, cMsk) = Sft.renderToolCall(Seq(20L, 21L))
    assert(cIds == Seq(Sft.AsstId, Sft.ToolCallId, 20L, 21L, Sft.EosId))
    assert(cMsk == Seq(0L, 0L, 1L, 1L, 1L))
    val (rIds, rMsk) = Sft.renderToolResult(Seq(30L))
    assert(rIds == Seq(Sft.ToolResId, 30L, Sft.EosId))
    assert(rMsk == Seq(0L, 0L, 0L))
    // empty call still teaches the stop
    val (eIds, eMsk) = Sft.renderToolCall(Nil)
    assert(eIds == Seq(Sft.AsstId, Sft.ToolCallId, Sft.EosId))
    assert(eMsk == Seq(0L, 0L, 1L))
    // extension discipline: text-only prefix byte-identical, new
    // sentinels appended at 6/7, learned offset 8
    assert(Bpe.ToolSpecials.take(6) == Bpe.SftSpecials)
    assert(Bpe.ToolSpecials(Sft.ToolCallId.toInt) == "<|tool_call|>")
    assert(Bpe.ToolSpecials(Sft.ToolResId.toInt) == "<|tool_result|>")
    val merges = Seq(Bpe.Merge(1, "a", "b", 5L))
    val v = Bpe.idVocabWithSpecials(merges, Bpe.ToolSpecials)
    assert(v("a") == 8L + 'a'.toLong)
    assert(v("ab") == 8L + 255L + 1L)
  }

  test("tool shards: window tiling and mask/id alignment against an " +
    "independent column-encode ground truth") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainLocal(
      Bpe.wordFreqBytes(docs.filter(col("source") === "src0"), "text"),
      12)
    val vocab = Bpe.idVocabWithSpecials(merges, Bpe.ToolSpecials)

    // ---- ground truth: unit synthesis in plain Scala, encode via
    // the COLUMN path (literal-replace twin of the scalable encoder),
    // render + assemble via the Sft helpers ----
    import spark.implicits._
    val raw = docs.select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)].collect()
    def sl(w: Array[String], lo: Int): String =
      w.slice(lo - 1, lo + 3).mkString(" ")
    def json(d: Long, q: String): String =
      s"""{"name":"fn${d % 7}","args":{"q":"$q"}}"""
    val unitRows = raw.filter(_._1 % 11 != 0).flatMap { case (d, t) =>
      val w = t.split(" ", -1).filter(_.nonEmpty)
      val two = d % 2 == 1
      val us = Seq(
        0 -> sl(w, 1), 1 -> json(d, sl(w, 5)), 2 -> sl(w, 9)) ++
        (if (two) Seq(3 -> json(d, sl(w, 13)), 4 -> sl(w, 17),
          5 -> sl(w, 21))
        else Seq(5 -> sl(w, 13)))
      us.map { case (u, c) => (d * 8 + u, c) }
    }.toSeq
    val streams: Map[Long, (Vector[Long], Vector[Long])] =
      Bpe.encodeBytes(unitRows.toDF("k", "content"), "k", "content",
          merges)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).map(vocab).toVector))
        .groupBy(_._1 / 8)
        .map { case (doc, ms) =>
          val rendered = ms.sortBy(_._1 % 8).toSeq.map { case (k, cids) =>
            (k % 8).toInt match {
              case 0 => Sft.renderMessage(cids, assistant = false)
              case 1 | 3 => Sft.renderToolCall(cids)
              case 2 | 4 => Sft.renderToolResult(cids)
              case _ => Sft.renderMessage(cids, assistant = true)
            }
          }
          val (ids, msk) = Sft.assembleConversation(rendered)
          doc -> (ids.toVector, msk.toVector)
        }

    // ---- the query's pieces ----
    val rows = ToolQueries.defs.find(_.name == "pipeline_tool_shards")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getString(8)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).toSet == streams.keySet,
      "piece doc set != JSON-valid doc set")
    rows.foreach(p => assert(p._4 == p._3 % 2 + 1, "n_calls wrong"))

    // windows tile densely and fill completely (except the last)
    val byChunk = rows.groupBy(_._1)
    val maxChunk = byChunk.keys.max
    assert(maxChunk >= 1L, "fixture must span multiple windows")
    byChunk.foreach { case (c, ps) =>
      val sorted = ps.sortBy(_._5)
      assert(sorted.map(_._2).toSeq == (1L to ps.length).toSeq,
        s"chunk $c seg ids not dense")
      sorted.foldLeft(0L) { case (expect, p) =>
        assert(p._5 == expect, s"chunk $c gap at ${p._5}"); p._5 + p._6
      }
      val fill = ps.map(_._6).sum
      if (c < maxChunk) assert(fill == Ctx, s"chunk $c fill $fill")
      else assert(fill <= Ctx)
    }

    // per document: consecutive slices of the ground-truth stream
    rows.groupBy(_._3).foreach { case (doc, ps) =>
      val (ids, msk) = streams(doc)
      val sorted = ps.sortBy(_._1)
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
    }

    // the hazard docs are rejected by the PARSE, not absent from the
    // fixture: they exist upstream with nonempty text
    assert(raw.exists(r => r._1 % 11 == 0 && r._2.nonEmpty))
  }

  test("tool windows: the export view is exactly the fold of the " +
    "pieces view; PAD only ever completes the last window") {
    val pieces = ToolQueries.defs.find(_.name == "pipeline_tool_shards")
      .get.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    val folded = pieces.groupBy(_._1).map { case (c, ps) =>
      (c, ps.length.toLong, ps.map(_._3).sum, Ctx - ps.map(_._3).sum,
        ps.map(_._4).sum, ps.map(_._5).sum,
        ps.map(_._2).min, ps.map(_._2).max)
    }.toSet
    val windows = ToolQueries.defs.find(_.name == "pipeline_tool_windows")
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
