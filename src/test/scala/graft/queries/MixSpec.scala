package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.ops.PlanChecks

/** Data-order / data-mix planning contracts. The oracle grades exact
  * values; this spec pins the PROPERTIES the values must embody. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("epoch shuffle: each epoch is a full permutation, epochs " +
    "disagree on order, and no epoch-keyed window plans") {
    val df = q("pipeline_epoch_shuffle")
    PlanChecks.assertNoWideWindow(df)
    val rows = df.select("epoch", "doc_id", "pos")
      .as[(Long, Long, Long)].collect()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    val n = byEpoch(0L).size
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to n).toSeq,
        s"epoch $e positions not a dense permutation")
      assert(rs.map(_._2).distinct.size == n, s"epoch $e repeats a doc")
    }
    // different epochs must order the corpus differently (the hash
    // seed includes the epoch; identical orders mean a dead seed)
    val ord = (e: Long) => byEpoch(e).sortBy(_._3).map(_._2).toSeq
    assert(ord(0L) != ord(1L) && ord(1L) != ord(2L))
    // and the order must not be the ingest order
    assert(ord(0L) != ord(0L).sorted)
  }

  test("epoch batches: bins restart per epoch, offsets are exact " +
    "cumulative token mass in shuffle order, no epoch window") {
    val df = q("pipeline_epoch_batches")
    PlanChecks.assertNoWideWindow(df)
    val rows = df.select("epoch", "n_tok", "start_offset", "bin")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (e, rs) =>
      var run = 0L
      rs.sortBy(_._3).foreach { case (_, w, start, bin) =>
        assert(start == run, s"epoch $e offset $start != $run")
        assert(bin == start / 2048L)
        run += w
      }
    }
    // all epochs carry the same total mass (same corpus, reshuffled)
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(totals.values.toSet.size == 1)
  }

  test("mixture anneal: epoch 0 keeps everything, rates descend " +
    "monotonically to the schedule's target, selection re-seeds") {
    val anneal = q("pipeline_mixture_anneal")
      .select("epoch", "source", "rate_permil", "kept_docs",
        "kept_tokens")
      .as[(Long, String, Long, Long, Long)].collect()
    val sched = q("pipeline_mixture_schedule")
      .select("source", "rate_permil", "n_docs", "natural_tokens")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val bySrc = anneal.groupBy(_._2)
    assert(bySrc.keySet == sched.keySet)
    bySrc.foreach { case (src, rows) =>
      val byEpoch = rows.map(r => r._1 -> r).toMap
      val (_, target, nDocs, natTok) = sched(src)
      // epoch 0: natural distribution, everything kept
      assert(byEpoch(0L)._3 == 1000L)
      assert(byEpoch(0L)._4 == nDocs && byEpoch(0L)._5 == natTok)
      // epoch 2 lands exactly on the schedule's target rate
      assert(byEpoch(2L)._3 == target, s"$src end rate")
      // rates non-increasing along the anneal
      assert(byEpoch(0L)._3 >= byEpoch(1L)._3 &&
        byEpoch(1L)._3 >= byEpoch(2L)._3)
    }
    // re-seeding: some source keeps a DIFFERENT doc count in epochs
    // 1 vs 2 than a shared-seed selection would force (weak but
    // sufficient: the kept sets are not nested by construction —
    // assert at least one source's epoch-1 kept count differs from
    // both endpoints, i.e. selection actually varies per epoch)
    assert(anneal.exists(r => r._1 == 1L &&
      r._4 != bySrc(r._2).find(_._1 == 0L).get._4 &&
      r._3 != 1000L))
  }

  test("worker assignment: HRW monotonicity — every doc moved by " +
    "the 8->9 scale-up moves TO the new worker, at ~1/9 volume") {
    val rows = q("pipeline_worker_assign")
      .select("worker8", "worker9")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val moved = rows.filter(r => r._1 != r._2)
    moved.foreach { case (_, w9) =>
      assert(w9 == 8L,
        "a doc moved between SURVIVING workers — HRW monotonicity " +
          "violated")
    }
    val frac = moved.length.toDouble / rows.length
    assert(frac > 0.0 && frac < 0.25,
      s"moved fraction $frac implausible for 1/9 expectation")
    // both configurations use every worker (balance sanity)
    assert(rows.map(_._1).distinct.size == 8)
    assert(rows.map(_._2).distinct.size == 9)
  }

  test("mixture schedule: rates capped at 1000 permil, realized " +
    "mass never exceeds natural, under-natural sources keep all") {
    val rows = q("pipeline_mixture_schedule")
      .select("natural_tokens", "target_tokens", "rate_permil",
        "kept_tokens", "n_docs", "kept_docs")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nat, tgt, rate, kept, nd, kd) =>
      assert(rate >= 0 && rate <= 1000)
      assert(kept <= nat, "selection fabricated token mass")
      assert(kd <= nd)
      if (nat <= tgt)
        assert(rate == 1000 && kd == nd && kept == nat,
          "a source already under target must keep everything")
    }
    // the plan must actually bite somewhere (fixture sources are not
    // perfectly uniform)
    assert(rows.exists(r => r._3 < 1000),
      "no source downsampled — plan vacuous on this fixture")
  }
}
