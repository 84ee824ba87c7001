package graft.queries

import graft.SparkSpec

/** Structural invariants of the packed-window layout manifest
  * (`pipeline_packing_layout`) on the sf0.001 fixture — the DuckDB
  * oracle grades exact values; this spec pins what any corpus must
  * satisfy, so a boundary off-by-one fails with a named invariant. */
class PackingLayoutSpec extends SparkSpec {

  private val Ctx = 2048L

  test("packed layout: full windows, dense in-window segments, " +
    "contiguous document pieces") {
    val rows = BpeQueries.defs
      .find(_.name == "pipeline_packing_layout").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byChunk = rows.groupBy(_._1)
    val maxChunk = byChunk.keys.max
    byChunk.foreach { case (c, ps) =>
      // seg ids dense 1..k in local_start order
      val sorted = ps.sortBy(_._4)
      assert(sorted.map(_._2).toSeq == (1L to ps.length).toSeq,
        s"chunk $c seg ids not dense")
      // pieces tile the window with no gap or overlap
      sorted.foldLeft(0L) { case (expect, (_, _, _, ls, pl, _)) =>
        assert(ls == expect, s"chunk $c gap at $ls (expected $expect)")
        assert(pl >= 1L, s"chunk $c zero piece")
        ls + pl
      }
      val fill = ps.map(_._5).sum
      if (c < maxChunk)
        assert(fill == Ctx, s"chunk $c fill $fill != $Ctx")
      else assert(fill <= Ctx, s"tail chunk overfull: $fill")
    }
    // per document: pieces are contiguous in doc-token space and
    // appear in ascending chunk order
    rows.groupBy(_._3).foreach { case (doc, ps) =>
      val sorted = ps.sortBy(_._1)
      sorted.foldLeft(0L) { case (expect, (_, _, _, _, pl, dts)) =>
        assert(dts == expect,
          s"doc $doc piece starts at $dts, expected $expect")
        expect + pl
      }
    }
  }
}
