package graft.cli

import graft.SparkSpec

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

class BlueprintCliSpec extends SparkSpec {

  private def ls(root: Path): Set[String] =
    Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSet

  test("parse mirrors the reference argparse surface incl. defaults") {
    val a = BlueprintCli.parse(Array("download",
      "--container-uri", "file:///c", "--local-root", "file:///l",
      "--source-file-name", "x.csv"))
    assert(a.op == "download" && a.matchType == "exact_match" &&
      a.destinationFileName.isEmpty)
    intercept[IllegalArgumentException] {
      BlueprintCli.parse(Array("upload", "--source-file-name", "x",
        "--source-file-name-match-type", "bogus"))
    }
  }

  test("upload via CLI runs end-to-end with exit code 0") {
    val src = specTempDir("cli-src")
    Files.createDirectories(src.resolve("in"))
    Files.writeString(src.resolve("in/a.csv"), "x")
    val dst = specTempDir("cli-dst")
    val code = BlueprintCli.run(spark, BlueprintCli.parse(Array("upload",
      "--local-root", src.toUri.toString,
      "--container-uri", dst.toUri.toString,
      "--source-folder-name", "in",
      "--source-file-name", "\\.csv$",
      "--source-file-name-match-type", "regex_match",
      "--destination-folder-name", "up")))
    assert(code == 0)
    assert(ls(dst) == Set("up/a.csv"))
  }

  test("zero-match delete exits 200, like the reference") {
    val c = specTempDir("cli-c")
    val code = BlueprintCli.run(spark, BlueprintCli.parse(Array("delete",
      "--container-uri", c.toUri.toString,
      "--source-file-name", "nothing-here",
      "--source-file-name-match-type", "regex_match")))
    assert(code == 200)
  }

  test("dry run reports matches without side effects") {
    val src = specTempDir("cli-src2")
    Files.writeString(src.resolve("a.csv"), "x")
    val dst = specTempDir("cli-dst2")
    val code = BlueprintCli.run(spark, BlueprintCli.parse(Array("upload",
      "--local-root", src.toUri.toString,
      "--container-uri", dst.toUri.toString,
      "--source-file-name", "\\.csv$",
      "--source-file-name-match-type", "regex_match",
      "--dry-run")))
    assert(code == 0 && ls(dst).isEmpty)
  }
}
