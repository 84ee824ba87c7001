package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for the non-BPE tokenizer families' depth
  * claims (not part of the driver contract) — the [[DevBpeK]] twin
  * for WordPiece and unigram-LM: trains each family at a sweep of
  * vocab depths over the salted corpus surface
  * (`BpeQueries.saltedCorpus`, 384 buckets) and prints per-depth
  * wall time plus the learned size, the measurement behind SCALE.md's
  * per-merge/per-round cost claims for those trainers.
  * Usage: runMain graft.DevTokK [family=wp|uni|both] [depths...]
  * (depth defaults: 1024 4096 8192). */
object DevTokK {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val family = args.headOption.getOrElse("both")
    val depths = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(1024, 4096, 8192)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val (wordsRaw, _) =
      graft.queries.BpeQueries.saltedCorpus(spark, sfDir, buckets = 384)
    val words = wordsRaw.localCheckpoint(true)
    val vocabRows = words.count()
    println(s"[devtokk] salted vocab rows: $vocabRows ($sfDir)")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    if (family == "wp" || family == "both") depths.foreach { k =>
      val (t, sec) = time(ext.WordPiece.trainLocal(words, k))
      println(f"[devtokk] wordpiece k=$k: ${t.merges.size} merges " +
        f"in $sec%.2f s (${sec / math.max(t.merges.size, 1) * 1000}%.3f ms/merge)")
    }
    if (family == "uni" || family == "both") depths.foreach { k =>
      val (p, sec) = time(ext.Unigram.trainLocal(words,
        maxPieceLen = 4, seedSize = k, emRounds = 2))
      println(f"[devtokk] unigram seed=$k: ${p.size} pieces " +
        f"in $sec%.2f s (${sec / math.max(p.size, 1) * 1000}%.3f ms/piece)")
    }
    spark.stop()
  }
}
