package graft.queries

import graft.SparkSpec

/** Cross-family invariants of `text_tokenizer_eval` on the sf0.001
  * fixture — the DuckDB oracle grades exact values at sf0.01; this
  * spec pins the STRUCTURE every fixture must satisfy, so a contract
  * drift (a family dropping words it should encode, a fertility
  * below 1, an OOV count exceeding the token count) fails with a
  * named invariant instead of a hash mismatch. */
class TokenizerEvalSpec extends SparkSpec {

  test("tokenizer eval: three families, shared denominators, " +
    "fertility and OOV bounds hold per family") {
    // the query persists its word tables and delegates the cache
    // lifetime to the caller (the Verify/Bench contract) — clear it
    val rows =
      try TokenizerEvalQueries.defs.head.fn(spark, sfDir).collect()
      finally spark.catalog.clearCache()
    val fams = rows
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(fams.keySet == Set("bpe", "unigram", "wordpiece"))
    fams.foreach { case (fam, (nWords, nChars, nTokens, nOov)) =>
      assert(nWords > 0 && nChars > nWords, fam)
      // every encoded word emits at least one token ([UNK] included)
      assert(nTokens >= nWords, s"$fam fertility < 1")
      // and no word emits more tokens than characters
      assert(nTokens <= nChars, s"$fam tokens exceed chars")
      // the 12 graded merges must actually compress
      assert(nTokens < nChars, s"$fam merges never fired")
      assert(nOov >= 0 && nOov <= nTokens, s"$fam OOV out of range")
    }
    // BPE and WordPiece share the all-words contract; the unigram
    // lattice excludes over-budget words, so its denominator is <=
    assert(fams("bpe")._1 == fams("wordpiece")._1)
    assert(fams("bpe")._2 == fams("wordpiece")._2)
    assert(fams("unigram")._1 <= fams("bpe")._1)
  }
}
