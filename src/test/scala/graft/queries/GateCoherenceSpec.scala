package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Cross-operator coherence: independently-built queries that claim to
  * measure the same thing must AGREE — a drift between them means one
  * of the two replays the gate differently than it documents.
  */
class GateCoherenceSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("funnel stage 1 equals the marginals audit's encoding gate: " +
    "same plant, same predicate, same counts — via two independent " +
    "query plans") {
    val funnel = q("pipeline_corpus_funnel")
      .as[(Int, String, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    val marginals = q("dq_gate_marginals")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, _, encIn, encKept, _) = funnel("encoding")
    // the funnel's first stage sees the whole corpus, so its drop
    // count must equal the audit's INDEPENDENT encoding-gate drops
    assert(encIn - encKept == marginals("encoding")._2,
      s"funnel=${funnel("encoding")} audit=${marginals("encoding")}")
    // every audit gate's unique drops are bounded by its total drops
    marginals.values.foreach { case (g, drop, uniq, _) =>
      assert(uniq <= drop, s"$g: unique $uniq > total $drop")
    }
    // the wordlist gates share predicate and threshold too, but the
    // funnel applies it AFTER the encoding stage — so its stage-2
    // drops are at most the audit's independent wordlist drops
    assert(funnel("wordlist")._3 - funnel("wordlist")._4 <=
      marginals("wordlist")._2)
  }

  test("concat-and-chunk invariants: every chunk but the last fills " +
    "to exactly the context budget, chunk ids are contiguous from 0, " +
    "and the fills sum to the corpus token total") {
    val rows = q("pipeline_bpe_chunks")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // contiguous ids from 0
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq)
    // full chunks everywhere but the tail
    rows.init.foreach { case (c, _, _, _, fill) =>
      assert(fill == 2048L, s"chunk $c fill=$fill")
    }
    assert(rows.last._5 >= 1L && rows.last._5 <= 2048L)
    // doc ranges tile monotonically (tuple: chunk_id, n_docs,
    // first_doc, last_doc, fill): the next chunk starts at the
    // previous chunk's last doc (the boundary doc SPANS — the concat
    // semantics) or, when a doc ends exactly on the boundary, later
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 >= a._4,
        s"chunk ${b._1} first ${b._3} < chunk ${a._1} last ${a._4}")
      case _ => ()
    }
    // and on this fixture full chunks are the norm, so at least one
    // boundary doc actually spans two chunks
    assert(rows.toSeq.sliding(2).exists {
      case Seq(a, b) => b._3 == a._4
      case _ => false
    }, "no document spans any chunk boundary — not concat semantics")
  }

  test("pipeline_bpe_vocab8k's monotone-compression guard: a valid " +
    "summary row passes through unchanged, a regressed trainer's row " +
    "raise_errors in the plan with all three totals") {
    val cols = Seq("merges_learned", "vocab_rows", "n_chars",
      "n_tokens_k12", "n_tokens_kbig")
    val good = Seq((8192L, 3000L, 100000L, 60000L, 40000L))
      .toDF(cols: _*)
    assert(BpeQueries.compressionGuard(good).collect().map(_.toSeq)
      .toSeq == Seq(Seq(8192L, 3000L, 100000L, 60000L, 40000L)))
    // violated: more merges compressed LESS — the invariant a silent
    // trainer regression would break
    val bad = Seq((8192L, 3000L, 100000L, 40000L, 60000L))
      .toDF(cols: _*)
    val e = intercept[Exception](
      BpeQueries.compressionGuard(bad).collect())
    assert(e.getMessage.contains("monotone-compression"), e.getMessage)
    // also violated: "compression" past the raw symbol count
    val bad2 = Seq((8192L, 3000L, 50000L, 60000L, 40000L))
      .toDF(cols: _*)
    val e2 = intercept[Exception](
      BpeQueries.compressionGuard(bad2).collect())
    assert(e2.getMessage.contains("monotone-compression"), e2.getMessage)
  }
}
