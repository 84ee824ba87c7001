package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

/** `Tables.validate` contract: silent on a conforming fixture, ONE
  * exception naming every (table, column, expected, found) diff on a
  * drifted one — the guard that turns the round-6 failure mode (17
  * scattered analysis errors from one re-encoded column) into a single
  * load-time report.
  */
class TablesValidateSpec extends SparkSpec {
  import spark.implicits._

  test("live fixture validates silently") {
    Tables.validate(spark, sfDir)
  }

  private def fixtureCopy(): String = {
    val dir = specTempDir("validate-spec")
    dir.toFile.deleteOnExit()
    Tables.names.foreach { t =>
      Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
    }
    dir.toString
  }

  private def replace(dir: String, table: String)(write: Path => Unit): Unit = {
    val p = Paths.get(dir, s"$table.parquet")
    Files.delete(p)
    write(p)
  }

  test("type drift fails with a named (table, column, expected, found) diff") {
    val dir = fixtureCopy()
    replace(dir, "documents") { p =>
      // doc_id re-encoded as STRING — the class of silent fixture drift
      Seq(("1", "a b c", "en", "web", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(p.toString)
    }
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("documents.doc_id"))
    assert(e.getMessage.contains("expected bigint"))
    assert(e.getMessage.contains("found string"))
  }

  test("missing column and unreadable table are both named, in one report") {
    val dir = fixtureCopy()
    replace(dir, "region") { p =>
      Seq((1, "AMERICA")).toDF("r_regionkey", "wrong_name")
        .write.parquet(p.toString)
    }
    replace(dir, "nation") { _ => () } // deleted, not rewritten
    val e = intercept[IllegalStateException](Tables.validate(spark, dir))
    assert(e.getMessage.contains("region.r_name: missing"))
    assert(e.getMessage.contains("nation: unreadable"))
  }

  test("additive extra columns and nullability are not drift") {
    val dir = fixtureCopy()
    replace(dir, "region") { p =>
      Seq((1, "AMERICA", "extra")).toDF("r_regionkey", "r_name", "comment")
        .write.parquet(p.toString)
    }
    Tables.validate(spark, dir)
  }
}
