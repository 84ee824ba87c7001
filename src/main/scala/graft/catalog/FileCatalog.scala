package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.sql.Timestamp

/** Hadoop `Configuration` is not `Serializable`; ship it to executors via
  * its own writable form. (Equivalent of Spark's private
  * `SerializableConfiguration`.)
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** The engine's file-catalog relation (SURVEY.md §1.2): the namespace scan
  * the reference performs with `glob.glob` (local,
  * `upload_file.py:147-155`) or `ContainerClient.list_blobs(prefix=...)`
  * (remote, `download_file.py:144-151`), generalized to any Hadoop
  * `FileSystem` (file://, hdfs://, abfss://, s3a:// share the API) and
  * returned as a DataFrame with a fixed schema.
  *
  * Scale design: a 100 TB namespace has many millions of entries. The
  * driver lists only the first level under the root, then the per-subtree
  * recursive listing fans out across executors (`flatMap` over a
  * parallelized seq of subtrees) — the classic distributed-listing pattern,
  * so no single process walks the whole tree. Prefix pushdown mirrors the
  * reference: the prefix is part of the listed path, evaluated by the
  * storage service, never client-side.
  */
object FileCatalog {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("modificationTime", TimestampType, nullable = false)))

  /** List all FILES under `rootUri` (directories excluded — the reference
    * would crash `open()`ing a matched directory, `upload_file.py:183`; we
    * fix that deliberately, SURVEY.md §2.1 S1).
    *
    * @param prefix  server-side path prefix (S2 pushdown): only entries
    *                whose path relative to root starts with it are listed,
    *                by addressing the deepest whole directory of the prefix
    *                directly and filtering the remainder on the first level.
    */
  def list(
      spark: SparkSession,
      rootUri: String,
      prefix: String = "",
      recursive: Boolean = true): DataFrame = {
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = new Path(rootUri)
    val fs = root.getFileSystem(conf.value)
    val qualifiedRoot = fs.makeQualified(root)
    val rootStr = qualifiedRoot.toString

    // Prefix pushdown: descend into the directory part of the prefix.
    val slash = prefix.lastIndexOf('/')
    val (dirPart, residual) =
      if (slash >= 0) (prefix.substring(0, slash), prefix.substring(slash + 1))
      else ("", prefix)
    val scanRoot =
      if (dirPart.isEmpty) qualifiedRoot else new Path(qualifiedRoot, dirPart)

    if (!fs.exists(scanRoot)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

    // Driver lists one level; subtrees fan out to executors.
    val firstLevel: Array[FileStatus] = fs.listStatus(scanRoot)
    val matching = firstLevel.filter { st =>
      residual.isEmpty || st.getPath.getName.startsWith(residual)
    }
    val (dirs, files) = matching.partition(_.isDirectory)

    def toRow(st: FileStatus): Row = {
      val p = st.getPath.toString
      val rel = relName(p, rootStr)
      Row(p, rel, st.getLen, new Timestamp(st.getModificationTime))
    }

    val topRows = files.map(toRow).toSeq
    val subtreeRows =
      if (!recursive || dirs.isEmpty) spark.sparkContext.emptyRDD[Row]
      else {
        val dirPaths = dirs.map(_.getPath.toString).toSeq
        spark.sparkContext
          .parallelize(dirPaths, math.min(dirPaths.size, 64))
          .flatMap { d =>
            val p = new Path(d)
            val dfs = p.getFileSystem(conf.value)
            val it = dfs.listFiles(p, true)
            val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (it.hasNext) {
              val st = it.next()
              buf += Row(st.getPath.toString,
                relName(st.getPath.toString, rootStr),
                st.getLen, new Timestamp(st.getModificationTime))
            }
            buf
          }
      }
    val all = spark.sparkContext.parallelize(topRows, 1) ++ subtreeRows
    spark.createDataFrame(all, schema)
  }

  /** Point lookup (F2 `exact_match` — no listing, `delete_file.py:134-139`). */
  def stat(spark: SparkSession, rootUri: String, relPath: String): DataFrame = {
    val root = new Path(rootUri)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(root, relPath)
    val rows =
      if (fs.exists(target)) {
        val st = fs.getFileStatus(target)
        Seq(Row(st.getPath.toString, relPath, st.getLen,
          new Timestamp(st.getModificationTime)))
      } else Seq.empty[Row]
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def relName(path: String, rootStr: String): String = {
    val r = if (rootStr.endsWith("/")) rootStr else rootStr + "/"
    if (path.startsWith(r)) path.substring(r.length) else path
  }
}
