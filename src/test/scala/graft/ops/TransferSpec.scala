package graft.ops

import graft.SparkSpec
import graft.catalog.FileCatalog
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Integration tests for the transfer operators (S3-S6) against `file://`
  * temp dirs — same Hadoop `FileSystem` code path as abfss/s3a
  * (FIXTURES.md §1 layout).
  */
class TransferSpec extends SparkSpec {
  import spark.implicits._

  private def mkContainer(): Path = {
    val root = specTempDir("graft-container")
    def w(rel: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, s"content of $rel")
    }
    Seq("data.csv", "report.tar.gz", "noext", "logs/2024/app.log",
      "logs/2024/app.log.1", "dupe/data.csv").foreach(w)
    root
  }

  private def listAll(root: Path): Set[String] =
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSet

  test("S1+F1: catalog scan + regex filter matches reference glob+re.search") {
    val root = mkContainer()
    val cat = FileCatalog.list(spark, root.toUri.toString)
    assert(cat.count() == 6)
    val logs = cat.filter(RegexMatch("app\\.log").predicate(col("name")))
      .select("name").as[String].collect().toSet
    assert(logs == Set("logs/2024/app.log", "logs/2024/app.log.1"))
  }

  test("S2: prefix pushdown lists only the prefix subtree") {
    val root = mkContainer()
    val cat = FileCatalog.list(spark, root.toUri.toString, prefix = "logs/")
    assert(cat.select("name").as[String].collect().toSet ==
      Set("logs/2024/app.log", "logs/2024/app.log.1"))
  }

  test("F2: stat point lookup") {
    val root = mkContainer()
    assert(FileCatalog.stat(spark, root.toUri.toString, "data.csv").count() == 1)
    assert(FileCatalog.stat(spark, root.toUri.toString, "nope.csv").count() == 0)
  }

  test("S4 upload round-trip with enumerated rename, no overwrite") {
    val src = mkContainer()
    val dst = specTempDir("graft-dst")
    val cat = FileCatalog.list(spark, src.toUri.toString)
      .filter(RegexMatch("data\\.csv").predicate(col("name")))
    val manifest = RenamePlan.planify(
        cat, destFolder = "up", destName = Some("d.csv"),
        numbering = RenamePlan.Numbering.Always)
      .withColumn("src_path", col("path"))
      .withColumn("dest_path",
        concat(lit(dst.toUri.toString), col("dest_path")))
    Transfer.copyFiles(manifest)
    assert(listAll(dst) == Set("up/d_1.csv", "up/d_2.csv"))
    // second upload to same destinations must refuse (ResourceExistsError)
    val e = intercept[SparkException] { Transfer.copyFiles(manifest) }
    assert(e.getCause.isInstanceOf[BlueprintError.DestinationExists] ||
      e.getMessage.contains("already exists"))
  }

  test("S5 move: rename semantics, source gone, dest present") {
    val root = mkContainer()
    val cat = FileCatalog.list(spark, root.toUri.toString, prefix = "logs/")
    val manifest = cat
      .withColumn("src_path", col("path"))
      .withColumn("dest_path",
        concat(lit(root.toUri.toString), lit("moved/"),
          element_at(split(col("name"), "/"), -1)))
    Transfer.moveFiles(manifest)
    val now = listAll(root)
    assert(now.contains("moved/app.log") && now.contains("moved/app.log.1"))
    assert(!now.exists(_.startsWith("logs/")))
  }

  test("S6 delete: files removed; missing file raises DeleteError") {
    val root = mkContainer()
    val cat = FileCatalog.list(spark, root.toUri.toString)
      .filter(RegexMatch("^dupe/").predicate(col("name")))
    Transfer.deleteFiles(cat)
    assert(!listAll(root).exists(_.startsWith("dupe/")))
    val ghost = Seq(root.resolve("ghost.csv").toUri.toString).toDF("path")
    val e = intercept[SparkException] { Transfer.deleteFiles(ghost) }
    assert(e.getCause.isInstanceOf[BlueprintError.DeleteError] ||
      e.getMessage.contains("Delete failed"))
  }

  test("zero-match gate raises NoMatchesFound (exit code 200)") {
    val root = mkContainer()
    val cat = FileCatalog.list(spark, root.toUri.toString)
      .filter(RegexMatch("zzz-nothing").predicate(col("name")))
    val err = intercept[BlueprintError.NoMatchesFound] {
      if (cat.isEmpty) throw BlueprintError.NoMatchesFound("zzz-nothing")
    }
    assert(err.exitCode == 200)
  }

  test("compactionPlan: empty catalog plans zero groups") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("path", "size")
    assert(Transfer.compactionPlan(empty, 100L).count() == 0)
  }

  test("compactionPlan: contiguous size-bounded merge groups") {
    import spark.implicits._
    // 1 oversized file + many small ones, shuffled input order
    val files = (1 to 40).map(i => (f"dir/part-$i%03d", 30L)) :+
      ("dir/part-900-huge", 450L)
    val cat = scala.util.Random.shuffle(files).toDF("path", "size")
      .repartition(5)
    val plan = Transfer.compactionPlan(cat, targetBytes = 100L)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // groups are contiguous in path order
    val groups = plan.map(_._3)
    assert(groups.sameElements(groups.sorted), groups.mkString(","))
    // every group of small files stays within budget; the oversized
    // file sits in its own group(s)
    val bySize = plan.groupBy(_._3).values
    for (g <- bySize if g.forall(_._2 < 100L))
      assert(g.map(_._2).sum <= 100L + 30L, g.mkString(","))
    val hugeGroup = plan.find(_._1.endsWith("huge")).get._3
    assert(plan.count(_._3 == hugeGroup) == 1,
      "an oversized file must not share its group")
    // deterministic under any partitioning
    val again = Transfer.compactionPlan(cat.repartition(2), 100L)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(plan.sameElements(again))
  }
}
