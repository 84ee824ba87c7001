package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE freeze, four shard exports (r16 verdict #3).
  *
  * Each shard family query (`pipeline_{sft,vlm,dpo,fim}_shards`)
  * derives its corpus and trains its tokenizer inside its own plan —
  * the right shape for a self-contained grade, the WRONG shape for
  * production, where a 100 TB freeze is computed once and every
  * trainer-facing export reads the SAME frozen store and the SAME
  * persisted tokenizer artifact. All four families train the
  * IDENTICAL tokenizer (byte-level, K merges, src0 slice), so one
  * artifact serves them all.
  *
  * This module is that composition: a marker-gated build persists the
  * corpus frame and the trained tokenizer once per (fixture, JVM)
  * — `pipeline_freeze_export`'s store discipline — and the four
  * export queries then read ONLY the store (explicit schema) and the
  * RELOADED artifact ([[Bpe.loadTokenizer]], with its version/
  * pattern/rank validation in the path) through the families' own
  * parameterized constructions. Each export grades against the SAME
  * oracle SQL as its family query: the export must be bit-for-bit
  * the family result, proving no re-gate / re-train / re-derivation
  * happened — and `FamilyExportSpec` asserts the export plan scans
  * the store, never `documents.parquet`.
  */
object FamilyExportQueries {

  import BpeQueries.K

  /** Build the shared freeze store once per (fixture, JVM): the
    * corpus frame + the tokenizer artifact. Returns (corpusDir,
    * tokenizerDir). */
  private def ensureStore(s: SparkSession, d: String): (String, String) = {
    val root = graft.Scratch.dir("family-freeze", d)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_built")
    val corpus = s"$root/corpus"
    val tok = s"$root/tokenizer"
    if (!fs.exists(marker)) {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          coalesce(col("text"), lit("")).as("text"))
      docs.write.mode("overwrite").parquet(corpus)
      val merges = Bpe.trainLocal(
        Bpe.wordFreqBytes(docs.filter(col("source") === "src0"),
          "text"), K)
      Bpe.saveTokenizer(s, tok, merges, byteLevel = true)
      fs.create(marker, true).close()
    }
    (corpus, tok)
  }

  /** The frozen corpus frame — explicit schema (the empty-first-batch
    * lesson: a schema inferred from files can silently drift). */
  private def storeDocs(s: SparkSession, corpus: String): DataFrame =
    s.read.schema("doc_id LONG, source STRING, text STRING")
      .parquet(corpus)

  private def exportDef(name: String, oracle: String)(
      tail: (SparkSession, DataFrame, Seq[Bpe.Merge]) => DataFrame)
      : QueryDef =
    QueryDef(name, oracle) { (s, d) =>
      val (corpus, tok) = ensureStore(s, d)
      tail(s, storeDocs(s, corpus), Bpe.loadTokenizer(s, tok).merges)
    }

  val defs: Seq[QueryDef] = Seq(
    exportDef("export_sft_shards", SftQueries.sqlSftShards)(
      (s, docs, m) =>
        SftQueries.sftShardTail(SftQueries.sftPiecesFrom(s, docs, m))),
    exportDef("export_vlm_shards", VlmQueries.sqlVlmShards)(
      VlmQueries.vlmShards),
    exportDef("export_dpo_shards", DpoQueries.sqlDpoShards)(
      DpoQueries.dpoShards),
    exportDef("export_fim_shards", FimQueries.sqlFimShards)(
      FimQueries.fimShards),
    exportDef("export_tool_shards", ToolQueries.sqlToolShards)(
      ToolQueries.toolShards))
}
