package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RenamePlanSpec extends SparkSpec {
  import spark.implicits._

  private def catalog(paths: String*) = paths.toDF("path")

  test("regex-branch numbering: every match numbered 1..n in path order") {
    val out = RenamePlan.planify(
      catalog("b/two.csv", "a/one.csv", "c/three.csv"),
      destFolder = "dst", destName = Some("out.csv"),
      numbering = RenamePlan.Numbering.Always)
      .orderBy("path")
      .select("path", "dest_path").as[(String, String)].collect()
    assert(out.toSeq == Seq(
      "a/one.csv" -> "dst/out_1.csv",
      "b/two.csv" -> "dst/out_2.csv",
      "c/three.csv" -> "dst/out_3.csv"))
  }

  test("no explicit dest name: basename used, numbering ignored (ref quirk)") {
    val out = RenamePlan.planify(
      catalog("a/x.csv", "b/x.csv"),
      destFolder = "dst", destName = None,
      numbering = RenamePlan.Numbering.Always)
      .orderBy("path").select("dest_path").as[String].collect()
    // collision preserved — faithful to upload_file.py:94-102
    assert(out.toSeq == Seq("dst/x.csv", "dst/x.csv"))
  }

  test("move quirk: single match => no enumeration") {
    val out = RenamePlan.planify(
      catalog("a/only.csv"),
      destFolder = "dst", destName = Some("final.csv"),
      numbering = RenamePlan.Numbering.UnlessSingle)
      .select("dest_path").as[String].collect()
    assert(out.toSeq == Seq("dst/final.csv"))
  }

  test("move quirk: multiple matches => enumeration") {
    val out = RenamePlan.planify(
      catalog("a/f1.csv", "a/f2.csv"),
      destFolder = "dst", destName = Some("final.csv"),
      numbering = RenamePlan.Numbering.UnlessSingle)
      .orderBy("path").select("dest_path").as[String].collect()
    assert(out.toSeq == Seq("dst/final_1.csv", "dst/final_2.csv"))
  }

  test("exact branch: no numbering; dirty dest folder cleaned (X1)") {
    val out = RenamePlan.planify(
      catalog("src/data.tar.gz"),
      destFolder = "/arch//2024/", destName = None,
      numbering = RenamePlan.Numbering.Never)
      .select("dest_path").as[String].collect()
    assert(out.toSeq == Seq("arch/2024/data.tar.gz"))
  }

  test("empty dest folder: bare file name") {
    val out = RenamePlan.planify(
      catalog("src/data.csv"), destFolder = "", destName = None,
      numbering = RenamePlan.Numbering.Never)
      .select("dest_path").as[String].collect()
    assert(out.toSeq == Seq("data.csv"))
  }
}
