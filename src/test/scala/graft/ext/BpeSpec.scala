package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("delimited replace IS greedy left-to-right pair merging: " +
    "adjacent sites both merge, overlapping runs merge like the " +
    "reference") {
    val df = Seq("abab", "aaa", "aaaaa", "xa", "bx").toDF("word")
    val merged = df.select(col("word"),
      Bpe.encodeWord(col("word"), Seq(Bpe.Merge(1, "a", "b", 0L)))
        .as("t")).as[(String, Seq[String])].collect().toMap
    assert(merged("abab") == Seq("ab", "ab")) // no shared-delimiter loss
    assert(merged("xa") == Seq("x", "a")) // 'a' suffix is NOT a site
    assert(merged("bx") == Seq("b", "x")) // 'b' prefix is NOT a site
    val aa = df.select(col("word"),
      Bpe.encodeWord(col("word"), Seq(Bpe.Merge(1, "a", "a", 0L)))
        .as("t")).as[(String, Seq[String])].collect().toMap
    assert(aa("aaa") == Seq("aa", "a")) // greedy consumes left first
    assert(aa("aaaaa") == Seq("aa", "aa", "a")) // Sennrich reference
  }

  test("train learns the hand-computable merge sequence, ties break " +
    "lexicographically, freq-weighted counting is per position") {
    // freq-weighted pairs: "aab" x3 -> (a,a)=3 (a,b)=3; "ab" x2 ->
    // (a,b)=2. So (a,b)=5 wins rank 1. After merging: "a ab" x3,
    // "ab" x2 -> (a,ab)=3 wins rank 2.
    val words = Seq(("aab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(words, numMerges = 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.freq)) ==
      Seq((1, "a", "b", 5L), (2, "a", "ab", 3L)))
    // only 2 merges learnable: third iteration finds single-symbol
    // words only ("aab" -> [a·ab] -> [aab], "ab" -> [ab]) and stops
    assert(merges.size == 2)
  }

  test("encode applies merges in rank order and flattens words; " +
    "word boundaries never merge") {
    val docs = Seq((1L, "aab ab b"), (2L, ""), (3L, "b a")).toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, "text")
    val merges = Bpe.train(words, 2)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(enc(1L) == Seq("aab", "ab", "b")) // full-word tokens emerge
    assert(enc(2L) == Seq())
    assert(enc(3L) == Seq("b", "a")) // "b a" stays two tokens
  }

  test("wordFreq is the single corpus pass; train guards reject bad " +
    "geometry; minFreq stops the loop") {
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    val wf = Bpe.wordFreq(docs, "text").as[(String, Long)].collect().toMap
    assert(wf == Map("x" -> 2L, "y" -> 1L))
    intercept[IllegalArgumentException] {
      Bpe.train(wf.toSeq.toDF("word", "freq"), 0)
    }
    intercept[IllegalArgumentException] {
      Bpe.train(wf.toSeq.toDF("word", "freq"), 1, minFreq = 0L)
    }
    // all words single-char: nothing to merge at any minFreq
    assert(Bpe.train(wf.toSeq.toDF("word", "freq"), 5).isEmpty)
  }

  test("encode is map-only: zero shuffle exchanges with a literal " +
    "merge table") {
    val docs = Seq((1L, "aab ab")).toDF("doc_id", "text")
    val df = Bpe.encode(docs, "doc_id", "text",
      Seq(Bpe.Merge(1, "a", "b", 5L), Bpe.Merge(2, "a", "ab", 3L)))
    df.collect()
    assert(graft.ops.Bucketing.shuffleExchanges(df) == 0,
      df.queryExecution.executedPlan.toString)
  }

  test("encode is streaming-NATIVE: the stateless map-only projection " +
    "runs mid-stream unchanged and matches the batch encode") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val merges = Seq(Bpe.Merge(1, "a", "b", 5L), Bpe.Merge(2, "a", "ab", 3L))
    val rows = Seq((1L, "aab ab b"), (2L, "ba aab"))
    val mem = MemoryStream[(Long, String)]
    val q = Bpe.encode(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .writeStream.format("memory").queryName("bpe_enc")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_enc").as[(Long, Seq[String])]
      .collect().toMap
    val batch = Bpe.encode(rows.toDF("doc_id", "text"),
      "doc_id", "text", merges).as[(Long, Seq[String])].collect().toMap
    assert(got == batch)
    assert(got(1L) == Seq("aab", "ab", "b"))
  }

  test("encode is LOSSLESS over 500 adversarial words: tokens " +
    "concatenate back to the word and characters are conserved, for " +
    "merges trained on the same distribution (incl. repeated-char runs)") {
    // deterministic LCG over a tiny alphabet -> dense pair overlap,
    // repeated runs, shared prefixes/suffixes — the shapes that broke
    // naive delimiter encodings
    var x = 12345L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 33 }
    val words = (0 until 500).map { _ =>
      val len = 1 + (nxt() % 9).toInt
      (0 until len).map(_ => ('a' + (nxt() % 4).toInt).toChar).mkString
    }
    val df = words.toDF("word")
    val merges = Bpe.train(
      df.groupBy("word").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq")), 10)
    assert(merges.size == 10) // dense alphabet: always 10 learnable
    val bad = df.select(col("word"),
        Bpe.encodeWord(col("word"), merges).as("t"))
      .filter(array_join(col("t"), "") =!= col("word") ||
        aggregate(transform(col("t"), s => length(s)),
          lit(0), (a, b) => a + b) =!= length(col("word")))
      .count()
    assert(bad == 0L)
  }

  test("delimit splits on CODE POINTS: a supplementary-plane emoji is " +
    "one symbol, not two surrogate halves; encode stays lossless") {
    val df = Seq("a\ud83d\ude00b", "caf\u00e9").toDF("word")
    val syms = df.select(col("word"),
        Bpe.symbols(Bpe.delimit(col("word"))).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(syms("a\ud83d\ude00b") == Seq("a", "\ud83d\ude00", "b"))
    assert(syms("caf\u00e9") == Seq("c", "a", "f", "\u00e9"))
    // lossless through a merge that fuses around the emoji
    val enc = df.select(col("word"), Bpe.encodeWord(col("word"),
        Seq(Bpe.Merge(1, "a", "\ud83d\ude00", 1L))).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("a\ud83d\ude00b") == Seq("a\ud83d\ude00", "b"))
    assert(enc("a\ud83d\ude00b").mkString == "a\ud83d\ude00b")
  }

  test("merge table round-trips through parquet: the shipped artifact " +
    "reproduces the encoder exactly") {
    val words = Seq(("aab", 3L), ("ab", 2L)).toDF("word", "freq")
    val merges = Bpe.train(words, 2)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges")
      .resolve("m").toString
    Bpe.mergeTable(spark, merges).write.parquet(dir)
    val loaded = spark.read.parquet(dir)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect()
      .map { case (r, l, rr, f) => Bpe.Merge(r, l, rr, f) }.toSeq
    assert(loaded == merges)
    val docs = Seq((1L, "aab ab b")).toDF("doc_id", "text")
    val a = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toSeq
    val b = Bpe.encode(docs, "doc_id", "text", loaded)
      .as[(Long, Seq[String])].collect().toSeq
    assert(a == b)
  }
}
