package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared physical-compaction contract for the micro-batch parquet
  * stores ([[CorpusStream.nearDedupBatches]]' band store,
  * [[AnnStream.indexBatches]]' code store,
  * [[DsirStream.countBatches]]' count store). All three grow one
  * `batch_id`-stamped unit per micro-batch forever without it; with it
  * the file count is bounded by `compactEvery` plus one merged unit.
  *
  * The rewrite is the park-aside swap: build the compacted frame from
  * the live store, write it to `<store>__compact`, rename the live
  * store to `<store>__old`, rename the rewrite in, delete the park. A
  * crash between the two renames leaves a parked store with no live
  * one — [[recoverParked]] at the NEXT batch start completes the swap
  * (rename back), so no window loses the store. A crash before the
  * first rename loses only the tmp dir (overwritten next time).
  *
  * Replay-safety rule shared by every caller: the fold must EXCLUDE
  * rows stamped with the current batch id (`batch_id < batchId`).
  * foreachBatch may replay the last uncommitted batch; a crashed first
  * attempt's partial rows must stay out of the merged history so the
  * replay's own (dynamic-overwrite or recomputed) write fully replaces
  * them — folding them in would double-count. Dropping them in the
  * rewrite is safe for the same reason: the replay rewrites them.
  */
object StoreCompaction {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Is a compaction pass due at this batch? (`compactEvery <= 0`
    * disables compaction entirely.) */
  def due(batchId: Long, compactEvery: Int): Boolean =
    compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0

  /** Recover a crashed swap: a parked `<store>__old` with no live store
    * means the process died between the two renames. MUST run at batch
    * start, before any read of the store. */
  def recoverParked(spark: SparkSession, storeDir: String): Unit = {
    val fs = fsOf(spark, storeDir)
    val store = new Path(storeDir)
    val parked = new Path(storeDir + "__old")
    if (!fs.exists(store) && fs.exists(parked)) {
      fs.rename(parked, store); ()
    }
  }

  /** Park-aside crash-safe rewrite of an existing store (no-op when the
    * store does not exist yet). `read` materializes the live store
    * (callers pass their explicit-schema reader — partition-directory
    * inference would int-ify `batch_id`), `fold` produces the compacted
    * frame, `write` lands it (same partitioning as the live store, so
    * downstream readers see an identical layout contract). */
  def swapRewrite(spark: SparkSession, storeDir: String)(
      read: String => DataFrame,
      fold: DataFrame => DataFrame,
      write: (DataFrame, String) => Unit): Unit = {
    val fs = fsOf(spark, storeDir)
    val store = new Path(storeDir)
    if (!fs.exists(store)) return
    val parked = new Path(storeDir + "__old")
    val tmp = new Path(storeDir + "__compact")
    write(fold(read(storeDir)), tmp.toString)
    if (fs.exists(parked)) fs.delete(parked, true)
    fs.rename(store, parked)
    fs.rename(tmp, store)
    fs.delete(parked, true)
    ()
  }
}
