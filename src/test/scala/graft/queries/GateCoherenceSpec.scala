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
}
