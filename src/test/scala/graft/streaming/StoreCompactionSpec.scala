package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Reader-visible atomicity of the park-aside swap on the local FS —
  * the transactional contract SCALE.md §13 maps onto Delta/Iceberg
  * commits. Directory rename is a single atomic syscall on a POSIX
  * local FS, so the states asserted here are the ONLY states a
  * concurrent reader can observe: entirely-old, entirely-new, or
  * path-missing (the recoverable mid-swap window) — never a mix of
  * old and new rows.
  */
class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeStore(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "v").write.mode("overwrite").parquet(dir)

  private def readStore(dir: String): Set[(Long, String)] =
    spark.read.parquet(dir).as[(Long, String)].collect().toSet

  test("swap atomicity: every reader-visible state is entirely-old, " +
    "entirely-new, or missing-but-recoverable — never a mix") {
    val root = specTempDir("swap-atomic")
    val store = root.resolve("store").toString
    val old = Seq((1L, "old"), (2L, "old"))
    val neu = Seq((1L, "new"))
    writeStore(store, old)
    val f = fs(store)
    // state 1 — rewrite parked at __compact: the live path still reads
    // entirely-old (the tmp dir is invisible to the store path)
    writeStore(store + "__compact", neu)
    assert(readStore(store) == old.toSet)
    // state 2 — live renamed aside (crash window between the two
    // renames): a reader sees PATH MISSING, never a half-store; the
    // next batch's recoverParked restores the old store WHOLE
    assert(f.rename(new Path(store), new Path(store + "__old")))
    intercept[Exception] { readStore(store) }
    StoreCompaction.recoverParked(spark, store)
    assert(readStore(store) == old.toSet)
    assert(!f.exists(new Path(store + "__old")))
    // state 3 — swap completed: a reader sees entirely-new
    assert(f.rename(new Path(store), new Path(store + "__old")))
    assert(f.rename(new Path(store + "__compact"), new Path(store)))
    assert(readStore(store) == neu.toSet)
    // state 4 — crash AFTER rename-in but before park delete: a live
    // store exists, so recoverParked must NOT clobber it with the park
    assert(f.exists(new Path(store + "__old")))
    StoreCompaction.recoverParked(spark, store)
    assert(readStore(store) == neu.toSet)
  }

  test("swapRewrite end-to-end: fold applied, stale park and tmp " +
    "removed, content replaced in place") {
    val root = specTempDir("swap-e2e")
    val store = root.resolve("store").toString
    writeStore(store, Seq((1L, "keep"), (2L, "drop"), (3L, "keep")))
    // a stale park from an earlier crashed swap must not block this one
    writeStore(store + "__old", Seq((9L, "stale")))
    StoreCompaction.swapRewrite(spark, store)(
      read = d => spark.read.parquet(d),
      fold = df => df.filter(org.apache.spark.sql.functions
        .col("v") === "keep"),
      write = (df, d) => df.write.mode("overwrite").parquet(d))
    assert(readStore(store) == Set((1L, "keep"), (3L, "keep")))
    val f = fs(store)
    assert(!f.exists(new Path(store + "__old")),
      "park must be deleted after a completed swap")
    assert(!f.exists(new Path(store + "__compact")),
      "tmp must be renamed away, not copied")
  }

  test("swapRewrite is a no-op when the store does not exist yet") {
    val root = specTempDir("swap-noop")
    val store = root.resolve("absent").toString
    StoreCompaction.swapRewrite(spark, store)(
      read = d => spark.read.parquet(d),
      fold = identity,
      write = (df, d) => df.write.parquet(d))
    assert(!fs(store).exists(new Path(store)))
  }
}
