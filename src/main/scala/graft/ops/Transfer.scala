package graft.ops

import graft.catalog.SerializableHadoopConf
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed file-transfer actions (SURVEY.md §2.1 S3-S6): the engine's
  * replacement for the reference's sequential per-file HTTPS loops
  * (`upload_file.py:215-226`, `download_file.py:215-226`,
  * `move_file.py:130-143`, `delete_file.py:127-133`).
  *
  * Execution model: the (src, dest) manifest is a DataFrame; the side
  * effect runs in `foreachPartition`, one Hadoop `FileSystem` handle per
  * task, so transfer parallelism = min(#files, cluster task slots) instead
  * of the reference's 1. All four clouds' stores (abfss/s3a/gs/file) share
  * the `FileSystem` API, so tests run against `file://` temp dirs with the
  * exact code paths production would use.
  *
  * Semantics preserved from the reference:
  *  - upload refuses to overwrite an existing destination
  *    (`upload_file.py:188-190`) — `overwrite = false` raises
  *    [[BlueprintError.DestinationExists]];
  *  - move = server-side rename when the store supports it, else
  *    copy+delete (`move_file.py:78-107`);
  *  - delete of a missing file raises [[BlueprintError.DeleteError]]
  *    (`delete_file.py:259-261`).
  */
object Transfer {

  /** Copy every (`src_path`, `dest_path`) row. Used for both upload and
    * download — direction is just which side is remote. */
  def copyFiles(manifest: DataFrame, overwrite: Boolean = false): Unit = {
    val conf = serializableConf(manifest)
    manifest.select("src_path", "dest_path").foreachPartition {
      (rows: Iterator[Row]) =>
        val cache = new FsCache(conf)
        rows.foreach { r =>
          val src = new Path(r.getString(0))
          val dst = new Path(r.getString(1))
          val srcFs = cache.get(src)
          val dstFs = cache.get(dst)
          if (!overwrite && dstFs.exists(dst))
            throw BlueprintError.DestinationExists(dst.toString)
          val parent = dst.getParent
          if (parent != null && !dstFs.exists(parent)) dstFs.mkdirs(parent)
          FileUtil.copy(srcFs, src, dstFs, dst, false, overwrite, conf.value)
        }
    }
  }

  /** Move every (`src_path`, `dest_path`) row: metadata `rename` first
    * (HNS accounts / posix), copy+delete fallback (flat namespaces) —
    * exactly the reference's copy-then-delete with the fast path added. */
  def moveFiles(manifest: DataFrame): Unit = {
    val conf = serializableConf(manifest)
    manifest.select("src_path", "dest_path").foreachPartition {
      (rows: Iterator[Row]) =>
        val cache = new FsCache(conf)
        rows.foreach { r =>
          val src = new Path(r.getString(0))
          val dst = new Path(r.getString(1))
          val srcFs = cache.get(src)
          val dstFs = cache.get(dst)
          try {
            val parent = dst.getParent
            if (parent != null && !dstFs.exists(parent)) dstFs.mkdirs(parent)
            // rename is only defined within one file system; cross-store
            // moves go straight to copy+delete (the reference's own shape)
            val sameStore = srcFs.getUri == dstFs.getUri
            val renamed = sameStore && srcFs.rename(src, dst)
            if (!renamed) {
              FileUtil.copy(srcFs, src, dstFs, dst, true, false, conf.value)
            }
          } catch {
            case e: Exception => throw BlueprintError.MoveError(
              src.toString, dst.toString, e)
          }
        }
    }
  }

  /** Delete every `path` row. */
  def deleteFiles(manifest: DataFrame): Unit = {
    val conf = serializableConf(manifest)
    manifest.select("path").foreachPartition { (rows: Iterator[Row]) =>
      val cache = new FsCache(conf)
      rows.foreach { r =>
        val p = new Path(r.getString(0))
        val fs = cache.get(p)
        val ok =
          try fs.delete(p, false)
          catch { case e: Exception =>
            throw BlueprintError.DeleteError(p.toString, e) }
        if (!ok) throw BlueprintError.DeleteError(
          p.toString, new java.io.FileNotFoundException(p.toString))
      }
    }
  }

  /** Catalog diff for incremental sync: files present in `src` but absent
    * from (or differently sized in) `dst`, by relative `name` — the
    * SURVEY.md §2.4 "source EXCEPT dest" primitive. A left-anti/outer
    * join on the two catalog scans: one shuffle keyed on name, no data
    * movement until the resulting manifest is executed. */
  def syncPlan(srcCatalog: DataFrame, dstCatalog: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = srcCatalog.select(col("path").as("src_path"), col("name"),
      col("size").as("src_size"))
    val d = dstCatalog.select(col("name"), col("size").as("dst_size"))
    s.join(d, Seq("name"), "left_outer")
      .filter(col("dst_size").isNull || col("dst_size") =!= col("src_size"))
      .select(col("src_path"), col("name"), col("src_size"),
        when(col("dst_size").isNull, lit("missing")).otherwise(lit("changed"))
          .as("reason"))
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (ceil(total/target) output files).
    * The 100 TB maintenance primitive for streaming-ingest landing zones
    * (FileStreamSink and per-batch uploads accrete small files that
    * degrade scan parallelism and NameNode/listing pressure). Returns
    * (filesBefore, filesAfter); (0, 0) when there is nothing to compact.
    *
    * The swap is TWO renames (dir -> bak, tmp -> dir), not atomic:
    * readers racing the swap can see a missing directory for an instant,
    * so run compaction in the pipeline's maintenance window. Every
    * rename result is checked; on failure the original is rolled back
    * and the backup is never deleted until the new directory is in
    * place. A leftover backup from a crashed prior run aborts the
    * operation (manual recovery beats silently picking a side). */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (parts.isEmpty) return (0, 0)
    val bak = new Path(path.getParent, path.getName + "__compact_bak")
    if (fs.exists(bak)) throw new IllegalStateException(
      s"stale backup $bak from a previous compact run — recover it first")
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path.getParent, path.getName + "__compact_tmp")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, bak)) throw new java.io.IOException(
      s"compact: could not move $path aside; directory untouched")
    if (!fs.rename(tmp, path)) {
      // roll the original back before failing — never leave dir missing
      fs.rename(bak, path)
      throw new java.io.IOException(
        s"compact: could not install $tmp; original restored")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(path)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  /** Distributed compaction PLAN over an arbitrary file catalog: assign
    * every file to a merge group of ~`targetBytes` by cumulative size in
    * path order ([[PrefixSum.packIntoBins]] — range partition + per-
    * partition window + a ≤numParts-row driver offset sum). Where
    * [[compact]] physically rewrites ONE directory it can list on the
    * driver, this plans a whole-catalog maintenance pass: 10^8 catalog
    * rows stay distributed end to end, and each group is an independent
    * rewrite task. Oversized files get their own group(s); groups are
    * contiguous in path order so merged files stay range-readable. */
  def compactionPlan(catalog: DataFrame,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions.col
    PrefixSum.packIntoBins(
        catalog.select(col("path"), col("size")),
        weight = col("size"), budget = targetBytes,
        orderBy = Seq(col("path")), binCol = "group_id")
      .select(col("path"), col("size"), col("start_offset"),
        col("group_id"))
  }

  /** One `FileSystem` per (scheme, authority) per task. */
  private final class FsCache(conf: SerializableHadoopConf) {
    private val m = scala.collection.mutable.HashMap.empty[String, FileSystem]
    def get(p: Path): FileSystem = {
      val uri = p.toUri
      val key = s"${uri.getScheme}://${uri.getAuthority}"
      m.getOrElseUpdate(key, {
        val fs = p.getFileSystem(conf.value)
        // ChecksumFileSystem (file://) would write .crc sidecars next to
        // every copy — not a real transfer artifact on any object store.
        fs.setWriteChecksum(false)
        fs
      })
    }
  }

  private def serializableConf(df: DataFrame): SerializableHadoopConf =
    new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
}
