package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vit(w: String, scores: Map[String, Long], l: Int = 4) =
    Unigram.viterbiLocal(w, scores, l)

  test("Viterbi segmentation: hand-computed example — fewest pieces " +
    "first, then the largest count sum") {
    // "abab": 2-piece options are [a,bab]=110 and [ab,ab]=10
    val s = Map("a" -> 10L, "b" -> 8L, "ab" -> 5L, "bab" -> 100L)
    assert(vit("abab", s) == Seq("a", "bab"))
    // fewest pieces beats any sum: [ab] (v=2-BIG) over [a,b] (v=20-2BIG)
    assert(vit("ab", Map("a" -> 10L, "b" -> 10L, "ab" -> 2L)) ==
      Seq("ab"))
  }

  test("Viterbi tie-break: equal piece count and equal sum resolve to " +
    "the LONGER last piece — the (v, l) argmax key") {
    // "abc": [ab,c] = 3+2 = 5 and [a,bc] = 1+4 = 5, both 2 pieces;
    // at the last position l=2 (bc) must win over l=1 (c)
    val s = Map("a" -> 1L, "ab" -> 3L, "c" -> 2L, "bc" -> 4L)
    assert(vit("abc", s) == Seq("a", "bc"))
  }

  test("character fallback: unscored characters segment as themselves " +
    "with count 0 — encoding is total within the length budget") {
    val s = Map("ab" -> 5L, "a" -> 3L, "b" -> 2L)
    assert(vit("axb", s) == Seq("a", "x", "b"))
    // supplementary-plane char: one code point, one piece
    val emoji = new String(Character.toChars(0x1F600))
    assert(vit("a" + emoji + "b", s) == Seq("a", emoji, "b"))
  }

  test("Viterbi is OPTIMAL under the integer objective: brute-force " +
    "enumeration over random words agrees on (piece count, count sum)") {
    val rng = new scala.util.Random(7)
    val pieces = Seq("a", "b", "c", "ab", "bc", "ca", "abc", "bca")
    val scores = pieces.zipWithIndex
      .map { case (p, i) => p -> (i * 7L + 1L) }.toMap
    def bruteBest(w: String): (Int, Long) = {
      // all segmentations whose multi-char pieces are scored;
      // single chars always allowed at count getOrElse 0
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { l =>
          val p = s.substring(0, l)
          if (l == 1 || scores.contains(p))
            segs(s.substring(l)).map(p +: _)
          else Nil
        }
      segs(w).map { seg =>
        (seg.size, seg.map(p => scores.getOrElse(p, 0L)).sum)
      }.minBy { case (n, sum) => (n, -sum) }
    }
    (1 to 60).foreach { _ =>
      val w = Seq.fill(2 + rng.nextInt(7))(
        "abc".charAt(rng.nextInt(3))).mkString
      val got = vit(w, scores)
      val (bn, bs) = bruteBest(w)
      assert(got.size == bn &&
        got.map(p => scores.getOrElse(p, 0L)).sum == bs,
        s"word=$w got=$got best=($bn,$bs)")
    }
  }

  test("trainLocal: hand-checkable EM — seed counts are per position " +
    "and freq-weighted, multi-char pieces that lose their counts " +
    "decay out, the alphabet survives at count 0") {
    // vocab: "abab" x3, "cd" x1. L=2, seed keeps top multi pieces.
    val words = Seq(("abab", 3L), ("cd", 1L)).toDF("word", "freq")
    val out = Unigram.trainLocal(words, maxPieceLen = 2, seedSize = 8,
      emRounds = 2)
    val m = out.map(p => p.piece -> p.freq).toMap
    // seed: ab=6 (two positions x freq 3), ba=3, cd=1, a=6, b=6, c=1,
    // d=1. round 1: "abab" -> [ab,ab] (2 pieces beats any 3+), so
    // ab=6; "cd" -> [cd]=1. chars all decay to 0 but stay.
    assert(m("ab") == 6L && m("cd") == 1L)
    assert(Seq("a", "b", "c", "d").forall(ch => m(ch) == 0L))
    // "ba" was seeded (count 3) but never used by a segmentation:
    // it must have decayed OUT, not lingered at 0
    assert(!m.contains("ba"))
    // total order of the output: freq desc, then code-point piece
    assert(out.map(_.piece) ==
      out.sortWith((x, y) =>
        if (x.freq != y.freq) x.freq > y.freq
        else Bpe.cmpCodePoints(x.piece, y.piece) < 0).map(_.piece))
  }

  test("trainLocal guards: piece-length range, the driver byte bound, " +
    "and the word-length exclusion") {
    val words = Seq(("abcd", 2L)).toDF("word", "freq")
    intercept[IllegalArgumentException](
      Unigram.trainLocal(words, maxPieceLen = 1))
    intercept[IllegalArgumentException](
      Unigram.trainLocal(words, maxPieceLen = 9))
    intercept[IllegalArgumentException](
      Unigram.trainLocal(words, maxVocabBytes = 10L))
    // a word past maxWordLen contributes nothing (not even alphabet)
    val out = Unigram.trainLocal(
      Seq(("ab", 1L), ("x" * 40, 9L)).toDF("word", "freq"),
      maxPieceLen = 2, maxWordLen = 16)
    assert(!out.exists(_.piece == "x"))
  }

  test("artifact store: save -> load round-trips pieces AND geometry, " +
    "reloaded-artifact encoding is token-identical, and the guards " +
    "refuse future versions, truncation and duplicate pieces") {
    val root = specTempDir("unigram-artifact")
    val words = Seq(("abab", 3L), ("cd", 1L)).toDF("word", "freq")
    val pieces = Unigram.trainLocal(words, maxPieceLen = 2,
      seedSize = 8, emRounds = 2)
    val dir = root.resolve("t").toString
    Unigram.savePieces(spark, dir, pieces, maxPieceLen = 2,
      maxWordLen = 16)
    val art = Unigram.loadPieces(spark, dir)
    assert(art.pieces == pieces && art.maxPieceLen == 2 &&
      art.maxWordLen == 16)
    val docs = Seq((1L, "abab cd"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Seq[String])].collect().toSet
    assert(snap(Unigram.encodeWithArtifact(docs, "doc_id", "text", art))
      == snap(Unigram.encodeScalable(docs, "doc_id", "text", pieces,
        maxPieceLen = 2, maxWordLen = 16)))
    // guards
    def meta(v: Int, n: Int): Unit =
      Seq((v, 2, 16, n))
        .toDF("version", "max_piece_len", "max_word_len", "n_pieces")
        .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    meta(2, pieces.size)
    val e1 = intercept[IllegalArgumentException](
      Unigram.loadPieces(spark, dir))
    assert(e1.getMessage.contains("version"), e1.getMessage)
    meta(1, pieces.size + 1)
    val e2 = intercept[IllegalArgumentException](
      Unigram.loadPieces(spark, dir))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    meta(1, 2)
    Seq(("x", 3L), ("x", 1L)).toDF("piece", "freq")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/pieces")
    val e3 = intercept[IllegalArgumentException](
      Unigram.loadPieces(spark, dir))
    assert(e3.getMessage.contains("duplicate"), e3.getMessage)
    intercept[IllegalArgumentException](
      Unigram.savePieces(spark, dir, Nil, 2, 16))
    intercept[IllegalArgumentException](
      Unigram.savePieces(spark, dir,
        Seq(Unigram.Piece("x", 1L), Unigram.Piece("x", 2L)), 2, 16))
    // geometry guards: a zero (or null-read-as-zero) lattice bound
    // would hang the encode backtrack; a zero word budget silently
    // encodes everything to nothing — both refuse loudly
    Seq(("x", 3L)).toDF("piece", "freq")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/pieces")
    Seq((1, 0, 16, 1))
      .toDF("version", "max_piece_len", "max_word_len", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    val e4 = intercept[IllegalArgumentException](
      Unigram.loadPieces(spark, dir))
    assert(e4.getMessage.contains("max_piece_len"), e4.getMessage)
    Seq((1, 2, 0, 1))
      .toDF("version", "max_piece_len", "max_word_len", "n_pieces")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/meta")
    val e5 = intercept[IllegalArgumentException](
      Unigram.loadPieces(spark, dir))
    assert(e5.getMessage.contains("max_word_len"), e5.getMessage)
  }

  test("trainLocal integer-objective bound: a frequency table hot " +
    "enough that per-word count sums could reach the 2^40 per-piece " +
    "penalty is refused, naming the down-scale remedy") {
    val hot = Seq(("ab", Unigram.Big / 8L)).toDF("word", "freq")
    val e = intercept[IllegalArgumentException](
      Unigram.trainLocal(hot, maxPieceLen = 2))
    assert(e.getMessage.contains("down-scale"), e.getMessage)
    // and the bound is about the SUM, not any single freq: a cool
    // table of the same shape trains fine
    val cool = Seq(("ab", 1000000L)).toDF("word", "freq")
    assert(Unigram.trainLocal(cool, maxPieceLen = 2).nonEmpty)
  }

  test("scoreScalable: per-doc integer sufficient statistics agree " +
    "with encode + manual scoring; null text scores as an empty doc") {
    val words = Seq(("abab", 3L), ("cd", 1L)).toDF("word", "freq")
    val pieces = Unigram.trainLocal(words, maxPieceLen = 2,
      seedSize = 8, emRounds = 2)
    val scores = pieces.map(p => p.piece -> p.freq).toMap
    val docs = Seq((1L, "abab cd xq"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Unigram.scoreScalable(docs, "doc_id", "text", pieces,
        maxPieceLen = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // manual: encode doc 1 and fold the same statistics
    val toks = Unigram.encodeScalable(docs, "doc_id", "text", pieces,
        maxPieceLen = 2)
      .as[(Long, Seq[String])].collect().toMap.apply(1L)
    val expSum = toks.map(p => scores.getOrElse(p, 0L)).sum
    val expOov = toks.count(p => scores.getOrElse(p, 0L) == 0L)
    assert(got(1L) == ((toks.size.toLong, expSum, expOov.toLong)))
    // "xq": x and q are outside the training alphabet -> 2 oov pieces
    assert(got(1L)._3 >= 2L)
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("encodeScalable is streaming-NATIVE: the stateless map-only " +
    "mapPartitions pass runs mid-stream unchanged and matches the " +
    "batch segmentation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val words = Seq(("abab", 3L), ("cd", 1L)).toDF("word", "freq")
    val pieces = Unigram.trainLocal(words, maxPieceLen = 2,
      seedSize = 8, emRounds = 2)
    val rows = Seq((1L, "abab cd"), (2L, "cd cd abab"))
    val mem = MemoryStream[(Long, String)]
    val q = Unigram.encodeScalable(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", pieces, maxPieceLen = 2)
      .writeStream.format("memory").queryName("uni_enc")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("uni_enc").as[(Long, Seq[String])]
      .collect().toMap
    val batch = Unigram.encodeScalable(rows.toDF("doc_id", "text"),
        "doc_id", "text", pieces, maxPieceLen = 2)
      .as[(Long, Seq[String])].collect().toMap
    // maxPieceLen=2: "abab" is two "ab" pieces, never one 4-char piece
    assert(got == batch && got(1L) == Seq("ab", "ab", "cd"))
  }

  test("encodeScalable: map-only corpus segmentation matches the " +
    "driver-side Viterbi word by word, null text yields null tokens, " +
    "over-budget words are excluded") {
    val words = Seq(("abab", 3L), ("cd", 1L)).toDF("word", "freq")
    val pieces = Unigram.trainLocal(words, maxPieceLen = 2,
      seedSize = 8, emRounds = 2)
    val scores = pieces.map(p => p.piece -> p.freq).toMap
    val docs = Seq(
      (1L, "abab cd abab"),
      (2L, null.asInstanceOf[String]),
      (3L, "abab " + "y" * 40 + " cd")).toDF("doc_id", "text")
    val got = Unigram.encodeScalable(docs, "doc_id", "text", pieces,
        maxPieceLen = 2)
      .as[(Long, Seq[String])].collect().toMap
    val ex1 = Seq("abab", "cd", "abab")
      .flatMap(w => Unigram.viterbiLocal(w, scores, 2))
    assert(got(1L) == ex1)
    assert(got(2L) == null)
    // the 40-char word is excluded; the rest still encode
    assert(got(3L) ==
      Seq("abab", "cd").flatMap(w => Unigram.viterbiLocal(w, scores, 2)))
  }

  test("▁ convention: markWords prefixes and filters, encodeMarked " +
    "walks the marked lattice, decodePieces inverts exactly") {
    import spark.implicits._
    val words = Seq(("abab", 6L), ("cd", 3L), ("x▁y", 9L),
      ("toolongtoolongxx", 2L)).toDF("word", "freq")
    // content-▁ and budget-overflow (16 chars vs cap 15) words drop;
    // survivors arrive ▁-prefixed
    val marked = Unigram.markWords(words, maxWordLen = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(marked == Set(("▁abab", 6L), ("▁cd", 3L)))
    val pieces = Unigram.trainLocal(
      Unigram.markWords(words, maxWordLen = 16),
      maxPieceLen = 4, seedSize = 16, emRounds = 2, maxWordLen = 16)
    // the inventory is ▁-aware: word-start pieces carry the marker
    assert(pieces.exists(p => p.piece.startsWith("▁") &&
      p.piece.length > 1))
    val docs = Seq(
      (1L, "abab cd   abab"),     // runs of spaces normalize away
      (2L, "cd x▁y abab"),        // content-▁ word drops from surface
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val dec = Unigram.encodeMarked(docs, "doc_id", "text", pieces,
        maxPieceLen = 4, maxWordLen = 16)
      .withColumn("rec", Unigram.decodePieces(org.apache.spark.sql
        .functions.col("tokens")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(dec(1L) == "abab cd abab")
    assert(dec(2L) == "cd abab")
    // null text: null tokens ride through, concat_ws folds to ""
    assert(dec(3L) == "")
    // totality: a word full of UNSEEN characters still round-trips
    // (single-char fallback — no [UNK] escape hatch in this family)
    val unseen = Seq((9L, "zzqq abab")).toDF("doc_id", "text")
    val rec2 = Unigram.encodeMarked(unseen, "doc_id", "text", pieces,
        maxPieceLen = 4, maxWordLen = 16)
      .withColumn("rec", Unigram.decodePieces(org.apache.spark.sql
        .functions.col("tokens")))
      .collect().head.getString(2)
    assert(rec2 == "zzqq abab")
  }
}
