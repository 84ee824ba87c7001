package graft
import org.apache.spark.sql.SparkSession

/** Dev harness behind the SCALE.md §8c prefix-vs-plain Jaccard numbers:
  * a synthetic LARGE-vocabulary corpus (the regime the sf fixtures
  * cannot exercise — their ~31-token vocab is PPJoin's worst case) with
  * universal stopwords and planted near-dups. Run:
  * `sbt "runMain graft.PpjProbe"`. */
object PpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // large-vocab Zipf-ish corpus: 4000 docs x 40 tokens, 20k vocab,
    // 10 hot stopwords in every doc, 200 planted near-dup pairs
    val rnd = new scala.util.Random(42)
    def tok(i: Int) = s"w$i"
    def doc(seed: Int): String = {
      val r = new scala.util.Random(seed)
      val rare = (0 until 30).map(_ => tok(10 + r.nextInt(20000)))
      val hot = (0 until 10).map(_ => tok(r.nextInt(10)))
      (rare ++ hot).mkString(" ")
    }
    val base = (0 until 4000).map(i => (i.toLong, doc(i)))
    val dups = (0 until 200).map { i =>
      val (id, t) = base(i)
      (10000L + i, t.split(" ").drop(1).mkString(" ") + " " + t.split(" ").head)
    }
    val docs = (base ++ dups).toDF("doc_id", "text").cache()
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s, $n pairs")
    }
    time("warm")(docs.count())
    time("plain  ")(graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", 1, 0.9).count())
    time("prefix ")(graft.ext.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 1, 0.9).count())
    time("plain2 ")(graft.ext.Dedup.jaccardPairs(docs, "doc_id", "text", 1, 0.9).count())
    time("prefix2")(graft.ext.Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 1, 0.9).count())
    spark.stop()
  }
}
