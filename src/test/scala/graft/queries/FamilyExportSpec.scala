package graft.queries

import graft.{SparkSpec, SparkEntry}

/** One-freeze multi-family export contracts (r16 verdict #3).
  *
  * The DuckDB oracle already proves each `export_*` equals its family
  * query's bytes (same SQL string, hash compare). This spec pins the
  * two things the oracle cannot see:
  *
  *  - the export tail NEVER re-scans the raw corpus: the store is
  *    built once from a throwaway fixture dir, then `documents
  *    .parquet` is DELETED and every export re-runs successfully —
  *    end-to-end proof that covers even the plan segments hidden
  *    behind localCheckpoint lineage cuts, where a plan-string
  *    assertion cannot look;
  *  - export and family queries agree row-for-row IN THIS ENGINE,
  *    independent of the oracle (a same-wrong-both-sides SQL bug
  *    cannot hide an export drift).
  */
class FamilyExportSpec extends SparkSpec {

  private def q(name: String, d: String = sfDir) =
    SparkEntry.queries(name)(spark, d)

  private val families = Seq("sft", "vlm", "dpo", "fim", "tool")

  test("exports run with documents.parquet DELETED once the store " +
    "is built — the tail reads only the freeze store") {
    val dir = specTempDir("family-export-fixture")
    val src = java.nio.file.Paths.get(sfDir)
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(p.getFileName.toString), p)
    }
    val d = dir.toString
    // first pass: builds the (fixture-keyed) store from documents
    families.foreach(f => assert(q(s"export_${f}_shards", d).count() > 0))
    // corpus gone; marker present -> every export must still run
    java.nio.file.Files.delete(dir.resolve("documents.parquet"))
    families.foreach { f =>
      val n = q(s"export_${f}_shards", d).count()
      assert(n > 0, s"export_${f}_shards returned no rows without " +
        "documents.parquet")
    }
  }

  test("exports reproduce the family queries row-for-row") {
    families.foreach { f =>
      val fam = q(s"pipeline_${f}_shards").collect().toSeq
      val exp = q(s"export_${f}_shards").collect().toSeq
      assert(fam.nonEmpty, s"$f family produced no rows")
      assert(exp == fam,
        s"export_${f}_shards drifted from pipeline_${f}_shards")
    }
  }
}
