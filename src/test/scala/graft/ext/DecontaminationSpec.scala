package graft.ext

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("planted benchmark overlap is found; clean docs are not flagged") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bid", "text")
    val corpus = Seq(
      // shares exactly one 5-gram: "quick brown fox jumps over"
      (10L, "a quick brown fox jumps over fences daily"),
      (11L, "completely unrelated words with zero shared grams here"),
      // exact copy: every 5-gram hits
      (12L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val byId = Decontamination
      .ngramHits(corpus, "doc_id", "text", bench, "text", 5)
      .select("doc_id", "n_hits", "n_sh").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!byId.contains(11L))
    assert(byId(10L) == ((1L, 4L)))
    assert(byId(12L) == ((5L, 5L))) // full containment
  }

  test("docs shorter than n produce no shingles and never match") {
    val bench = Seq((1L, "a b c d e f")).toDF("bid", "text")
    val corpus = Seq((10L, "a b c")).toDF("doc_id", "text")
    assert(Decontamination
      .ngramHits(corpus, "doc_id", "text", bench, "text", 5).count() == 0)
  }
}
