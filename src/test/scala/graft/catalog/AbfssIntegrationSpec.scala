package graft.catalog

import graft.SparkSpec
import graft.ops.Transfer
import org.apache.spark.sql.functions._

/** S7 integration: the credential bridge against a REAL blob endpoint.
  *
  * The sandbox has no cloud egress and no Azurite, so this spec is
  * env-gated and CANCELS (clean skip, not a silent pass) unless:
  *
  * {{{
  * GRAFT_ABFSS_TEST=1
  * GRAFT_ABFSS_CONN=DefaultEndpointsProtocol=...;AccountName=...;AccountKey=...
  * GRAFT_ABFSS_CONTAINER=<existing container>      (default: graft-test)
  * }}}
  *
  * Against Azurite, the standard dev-storage connection string works and
  * `EndpointSuffix` routing is exercised the same way as production.
  * What it proves when enabled: [[AzureConf]]'s connection-string →
  * Hadoop-conf mapping authenticates the abfss filesystem, and the
  * catalog/transfer surface (list → upload → download → move → delete)
  * round-trips bytes through the endpoint. Everywhere else the same
  * `FileSystem`-API path is exercised over `file://` by TransferSpec.
  */
class AbfssIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.get("GRAFT_ABFSS_TEST").contains("1")

  test("abfss round-trip: upload, list, download, move, delete") {
    assume(enabled,
      "set GRAFT_ABFSS_TEST=1 (plus GRAFT_ABFSS_CONN / " +
        "GRAFT_ABFSS_CONTAINER) to run against a blob endpoint")
    val connStr = sys.env.getOrElse("GRAFT_ABFSS_CONN",
      fail("GRAFT_ABFSS_TEST=1 but GRAFT_ABFSS_CONN is unset"))
    val container = sys.env.getOrElse("GRAFT_ABFSS_CONTAINER", "graft-test")

    val c = AzureConf(spark, connStr)
    val runId = s"graft-it-${java.util.UUID.randomUUID()}"
    val remoteBase = c.abfss(container, runId)

    // local scratch file to ship
    val localDir = specTempDir("abfss-it")
    val localFile = localDir.resolve("hello.txt")
    java.nio.file.Files.writeString(localFile, "graft abfss round-trip\n")

    try {
      // upload (no-overwrite default, like the reference)
      Transfer.copyFiles(Seq(
        (localFile.toUri.toString, s"$remoteBase/in/hello.txt"))
        .toDF("src_path", "dest_path"))

      // list through the catalog: prefix pushdown against the endpoint
      val listed = FileCatalog.list(spark, remoteBase, prefix = "in/")
      assert(listed.count() == 1L)
      assert(listed.select("name").as[String].collect().head == "in/hello.txt")

      // download and compare bytes
      val back = localDir.resolve("back.txt")
      Transfer.copyFiles(Seq(
        (s"$remoteBase/in/hello.txt", back.toUri.toString))
        .toDF("src_path", "dest_path"))
      assert(java.nio.file.Files.readString(back) ==
        java.nio.file.Files.readString(localFile))

      // server-side move (rename fast path on HNS, copy+delete otherwise)
      Transfer.moveFiles(Seq(
        (s"$remoteBase/in/hello.txt", s"$remoteBase/out/hello.txt"))
        .toDF("src_path", "dest_path"))
      assert(FileCatalog.list(spark, remoteBase, prefix = "out/").count() == 1L)
      assert(FileCatalog.list(spark, remoteBase, prefix = "in/")
        .filter(col("name") === "in/hello.txt").isEmpty)

      // delete and verify gone
      Transfer.deleteFiles(
        FileCatalog.list(spark, remoteBase, prefix = "out/"))
      assert(FileCatalog.list(spark, remoteBase, prefix = "out/").isEmpty)
    } finally {
      // best-effort remote cleanup + local scratch removal
      try {
        val root = new org.apache.hadoop.fs.Path(remoteBase)
        root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(root, true)
      } catch { case _: Exception => () }
      org.apache.commons.io.FileUtils.deleteDirectory(localDir.toFile)
    }
  }

  test("abfss URIs fail loudly (not silently) without the connector") {
    assume(!enabled, "only meaningful where no endpoint is configured")
    // in-sandbox sanity: resolving an abfss URI without hadoop-azure on
    // the classpath must raise an unsupported-filesystem error, proving
    // the scheme actually routes to the ABFS connector (and not to some
    // silent fallback) wherever the jar IS present
    val e = intercept[Exception] {
      FileCatalog.list(spark,
        "abfss://c@devstoreaccount1.dfs.core.windows.net/x").count()
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("abfss") || msg.contains("azurebfs") ||
      msg.contains("no filesystem"),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
