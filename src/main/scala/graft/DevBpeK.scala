package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing probe for the production-vocab BPE claims (not
  * part of the driver contract): trains the full >=8k-merge table
  * with `Bpe.trainLocal` over the salted corpus surface
  * (`BpeQueries.saltedCorpus`), then times `Bpe.encodeScalable` over
  * the same corpus under k=12 and k=8192 merge tables \u2014 the
  * measurement behind SCALE.md \u00a714's "encode cost is flat in k"
  * claim (the literal-replace chain would be O(k) per word; the
  * broadcast pair-index encoder touches only merges whose pair is
  * present). Usage: runMain graft.DevBpeK [reps] [k] [buckets] —
  * k defaults to 8192; buckets defaults to 96 (the graded surface)
  * or 384 when k needs a deeper merge forest (the 32k datapoint:
  * exhaustion scales ~linearly in buckets, 96 tops out ~11k). */
object DevBpeK {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val k = args.lift(1).map(_.toInt).getOrElse(8192)
    val buckets = args.lift(2).map(_.toInt)
      .getOrElse(if (k > 11000) 384 else 96)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.warehouse.dir", graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val (words, docs2raw) = graft.queries.BpeQueries
      .saltedCorpus(spark, sfDir, buckets)
    // freeze the salted corpus so every encode leg reads identical
    // input without re-deriving the md5 suffixes
    val docs2 = docs2raw.localCheckpoint(true)
    val nDocs = docs2.count()
    val t0 = System.nanoTime()
    val big = ext.Bpe.trainLocal(words, k)
    val trainSec = (System.nanoTime() - t0) / 1e9
    println(f"[devbpek] trainLocal: ${big.size} merges (asked $k, " +
      f"$buckets salt buckets) over ${words.count()} vocab rows in " +
      f"$trainSec%.2f s")
    def time(merges: Seq[ext.Bpe.Merge]): Seq[Double] =
      (1 to reps).map { _ =>
        val s0 = System.nanoTime()
        ext.Bpe.encodeScalable(docs2, "doc_id", "text", merges)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - s0) / 1e9
      }
    // the flat-in-k CONTROL: double the table with merges whose pairs
    // never occur in the corpus \u2014 identical merge WORK, 2x the k. A
    // k-dependent encoder (the literal chain is O(k) per word by
    // construction) doubles; the broadcast pair-index encoder must not.
    val padded = big ++ (1 to big.size).map(i =>
      ext.Bpe.Merge(big.size + i, s"\u2603$i", s"\u2604$i", 1L))
    time(big.take(12)) // unmeasured warm pass
    val small = time(big.take(12))
    val bigT = time(big)
    val padT = time(padded)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def fm(xs: Seq[Double]) = xs.map(t => f"$t%.2f").mkString(" ")
    println(f"[devbpek] encodeScalable over $nDocs docs: " +
      f"k=12 ${fm(small)} (med ${med(small)}%.2f s) | " +
      f"k=${big.size} ${fm(bigT)} (med ${med(bigT)}%.2f s, " +
      f"${med(bigT) / med(small)}%.2fx of k=12) | " +
      f"k=${padded.size} same-work control ${fm(padT)} " +
      f"(med ${med(padT)}%.2f s, ${med(padT) / med(bigT)}%.2fx of " +
      f"k=${big.size} \u2014 flat in table size)")
    spark.stop()
  }
}
