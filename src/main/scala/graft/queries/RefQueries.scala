package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.PathFunctions._
import graft.ops.{RegexMatch, RenamePlan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-derived operators (SURVEY.md §2.1-§2.3) exercised through the
  * DuckDB-comparable harness. The file namespace is synthesized from the
  * `documents` table (`path = data/<source>/doc_<doc_id>.txt`) so every
  * query has a parquet-backed oracle; the same operators run against real
  * `file://` catalogs in the scalatest integration suite
  * (TransferSpec/FileCatalogSpec).
  */
object RefQueries {

  /** The synthesized namespace: one row per document "file". */
  private def namespace(df: DataFrame): DataFrame =
    df.select(
      concat(lit("data/"), col("source"), lit("/doc_"), col("doc_id"),
        lit(".txt")).as("path"),
      col("doc_id"), col("source"), col("n_chars"))

  private val nsSql =
    """SELECT 'data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) ||
      |'.txt' AS path, doc_id, source, n_chars FROM documents""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // S2: prefix listing pushdown + F3 name projection + deterministic order
    QueryDef("ref_list_prefix",
      s"""WITH ns AS ($nsSql)
         |SELECT path, n_chars AS size FROM ns
         |WHERE path LIKE 'data/src1/%'
         |ORDER BY path""".stripMargin) { (s, d) =>
      namespace(Tables.documents(s, d))
        .filter(col("path").startsWith("data/src1/"))
        .select(col("path"), col("n_chars").as("size"))
        .orderBy("path")
    },

    // F1: unanchored regex match (re.search ≡ rlike), SURVEY §2.2
    QueryDef("ref_regex_filter",
      s"""WITH ns AS ($nsSql)
         |SELECT path FROM ns
         |WHERE regexp_matches(path, 'doc_\\d*[13579]\\.txt')
         |ORDER BY path""".stripMargin) { (s, d) =>
      namespace(Tables.documents(s, d))
        .filter(RegexMatch("doc_\\d*[13579]\\.txt").predicate(col("path")))
        .select("path")
        .orderBy("path")
    },

    // F2: exact-match point lookup (scan-elision branch)
    QueryDef("ref_exact_match",
      s"""WITH ns AS ($nsSql)
         |SELECT path, doc_id FROM ns
         |WHERE path = 'data/src7/doc_7.txt'
         |ORDER BY path""".stripMargin) { (s, d) =>
      namespace(Tables.documents(s, d))
        .filter(col("path") === "data/src7/doc_7.txt")
        .select("path", "doc_id")
        .orderBy("path")
    },

    // X1-X3+X5+X6: rename projection, basename branch (no explicit dest
    // name => file number ignored, upload_file.py:94-102)
    QueryDef("ref_rename_plan",
      s"""WITH ns AS ($nsSql)
         |SELECT path,
         |       'archive/2024/' || regexp_extract(path, '[^/]*$$', 0) AS dest_path
         |FROM ns
         |WHERE regexp_matches(path, 'doc_\\d?2\\.txt')
         |ORDER BY path""".stripMargin) { (s, d) =>
      RenamePlan.planify(
          namespace(Tables.documents(s, d))
            .filter(RegexMatch("doc_\\d?2\\.txt").predicate(col("path"))),
          destFolder = "/archive//2024/",   // exercises X1 cleaning
          destName = None,
          numbering = RenamePlan.Numbering.Always)
        .select("path", "dest_path")
        .orderBy("path")
    },

    // X4+A2: enumerated rename with explicit dest name — _<n> injected
    // before the FIRST dot, n = row_number over path order
    QueryDef("ref_rename_enumerate",
      s"""WITH ns AS ($nsSql),
         |m AS (
         |  SELECT path, ROW_NUMBER() OVER (ORDER BY path) AS file_number
         |  FROM ns WHERE source = 'src2'
         |)
         |SELECT path, file_number,
         |       'backup/' || regexp_replace('report.tar.gz', '\\.',
         |           '_' || CAST(file_number AS VARCHAR) || '.') AS dest_path
         |FROM m ORDER BY path""".stripMargin) { (s, d) =>
      RenamePlan.planify(
          namespace(Tables.documents(s, d)).filter(col("source") === "src2"),
          destFolder = "backup",
          destName = Some("report.tar.gz"),
          numbering = RenamePlan.Numbering.Always)
        .select("path", "file_number", "dest_path")
        .orderBy("path")
    },

    // move's single-match quirk: file_number = NULL when exactly one match
    // (move_file.py:135) => dest name NOT enumerated
    QueryDef("ref_move_single",
      s"""WITH ns AS ($nsSql)
         |SELECT path, 'out/final.csv' AS dest_path FROM ns
         |WHERE path = 'data/src0/doc_0.txt'
         |ORDER BY path""".stripMargin) { (s, d) =>
      RenamePlan.planify(
          namespace(Tables.documents(s, d))
            .filter(col("path") === "data/src0/doc_0.txt"),
          destFolder = "out",
          destName = Some("final.csv"),
          numbering = RenamePlan.Numbering.UnlessSingle)
        .select("path", "dest_path")
        .orderBy("path")
    },
  )
}
