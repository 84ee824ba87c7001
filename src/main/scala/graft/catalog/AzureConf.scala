package graft.catalog

import org.apache.spark.sql.SparkSession

/** S7 credential injection (SURVEY.md §2.1): the reference bridges a CLI
  * `--connection-string` into `AZURE_STORAGE_CONNECTION_STRING`
  * (`upload_file.py:50-58`, duplicated in all four scripts). The Spark
  * equivalent maps the same connection string onto the Hadoop ABFS
  * connector's per-account configuration, once, at session level —
  * after which `abfss://container@<account>.dfs.core.windows.net/...`
  * URIs resolve everywhere (FileCatalog, Transfer, DataFrame I/O).
  *
  * Pure string parsing — no Azure SDK, nothing to reach the network
  * until a URI is actually opened.
  */
object AzureConf {

  final case class ConnectionString(
      accountName: String, accountKey: String, endpointSuffix: String) {
    def blobHost: String = s"$accountName.blob.$endpointSuffix"
    def dfsHost: String = s"$accountName.dfs.$endpointSuffix"
    def abfss(container: String, path: String = ""): String =
      s"abfss://$container@$dfsHost/$path"
  }

  /** Parse the `k=v;k=v` connection-string format. */
  def parse(connStr: String): ConnectionString = {
    val kv = connStr.split(';').iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { p =>
        val i = p.indexOf('=')
        if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
      }.toMap
    ConnectionString(
      accountName = kv.getOrElse("AccountName",
        throw graft.ops.BlueprintError.IncorrectCredentials("missing AccountName")),
      accountKey = kv.getOrElse("AccountKey",
        throw graft.ops.BlueprintError.IncorrectCredentials("missing AccountKey")),
      endpointSuffix = kv.getOrElse("EndpointSuffix", "core.windows.net"))
  }

  /** Install the account key for both the ABFS (dfs) and WASB (blob)
    * hosts on the session's Hadoop conf. Overrides any system default —
    * same precedence as the reference's env-var bridge. */
  def apply(spark: SparkSession, connStr: String): ConnectionString = {
    val c = parse(connStr)
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(s"fs.azure.account.key.${c.dfsHost}", c.accountKey)
    hc.set(s"fs.azure.account.key.${c.blobHost}", c.accountKey)
    c
  }
}
