package graft.streaming

import graft.SparkSpec

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

class BlueprintStreamSpec extends SparkSpec {

  private def ls(root: Path): Set[String] =
    Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSet

  test("continuous upload ships matching files incrementally, exactly once") {
    val watch = specTempDir("bps-watch")
    val container = specTempDir("bps-container")
    val ckpt = specTempDir("bps-ckpt")
    Files.writeString(watch.resolve("a.csv"), "a")
    Files.writeString(watch.resolve("skip.log"), "x")
    val q = BlueprintStream.continuousUpload(spark,
      watch.toUri.toString, "\\.csv$", container.toUri.toString,
      "landed", ckpt.toString)
    try {
      q.processAllAvailable()
      assert(ls(container) == Set("landed/a.csv"))
      // second batch: only the new file moves (offsets remembered)
      Files.writeString(watch.resolve("b.csv"), "b")
      q.processAllAvailable()
      assert(ls(container) == Set("landed/a.csv", "landed/b.csv"))
      assert(Files.readString(container.resolve("landed/b.csv")) == "b")
    } finally q.stop()
  }
}
