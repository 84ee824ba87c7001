package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.ops.PlanChecks
import org.apache.spark.sql.functions.{col, sum}

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

  test("domain reweight: uniform start, exact multiplicative-weights " +
    "recurrence between consecutive rounds, permil mass conserved") {
    val rows = q("pipeline_domain_reweight")
      .select("mw_round", "source", "excess_micro", "eff_excess_micro",
        "weight_permil")
      .as[(Long, String, Long, Long, Long)].collect()
    val byRound = rows.groupBy(_._1)
    assert(byRound.keySet == (0L to 4L).toSet)
    val srcs = byRound(0L).map(_._2).sorted.toSeq
    val n = srcs.size
    // excess is a per-source constant across rounds (the measured
    // input, not the iterated state)
    rows.groupBy(_._2).foreach { case (s0, rs) =>
      assert(rs.map(_._3).distinct.size == 1, s"$s0 excess drifts")
    }
    // round 0: uniform permil floor, zero effective excess
    byRound(0L).foreach { case (_, _, _, eff, w) =>
      assert(eff == 0L && w == 1000L / n)
    }
    // rounds 1..4: replay the exact integer recurrence from the
    // previous round's weights — eff is the exposure-paid excess, u
    // the multiplicative bump, w the renormalized permil floor
    val maxEx = math.max(1L, rows.map(_._3).max)
    for (t <- 1L to 4L) {
      val prev = byRound(t - 1).map(r => r._2 -> r._5).toMap
      val cur = byRound(t).map(r => (r._2, r._3, r._4, r._5))
      val u = cur.map { case (s0, ex, _, _) =>
        val eff = ex * math.max(0L, 1000L - 2L * prev(s0)) / 1000L
        s0 -> prev(s0) * (1000L + 1000L * eff / maxEx)
      }.toMap
      val su = math.max(1L, u.values.sum)
      cur.foreach { case (s0, ex, eff, w) =>
        assert(eff == ex * math.max(0L, 1000L - 2L * prev(s0)) / 1000L,
          s"round $t $s0 eff mismatch")
        assert(w == 1000L * u(s0) / su, s"round $t $s0 weight mismatch")
      }
      val mass = cur.map(_._4).sum
      assert(mass > 1000L - n && mass <= 1000L,
        s"round $t permil mass $mass outside floor envelope")
    }
    // the fixture must exercise the dynamics: domains differ under
    // the reference LM (a positive excess exists) and the
    // max-normalized update actually moves weights
    assert(rows.exists(_._3 >= 1L), "no domain with graded excess")
    val w0 = byRound(0L).map(r => r._2 -> r._5).toMap
    val w4 = byRound(4L).map(r => r._2 -> r._5).toMap
    assert(srcs.exists(s0 => w0(s0) != w4(s0)), "weights never moved")
    // the hardest domain never ends below its uniform start
    val hardest = byRound(0L).maxBy(_._3)._2
    assert(w4(hardest) >= w0(hardest))
  }

  test("context shards: ranks tile each chunk exactly, interior " +
    "ranks full at 512, halos full at 64 left of every rank > 0") {
    val df = q("pipeline_context_shards")
    PlanChecks.assertNoWideWindow(df)
    val rows = df
      .select("chunk_id", "rank", "n_docs", "fill", "halo_docs",
        "halo_fill")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val lastChunk = rows.map(_._1).max
    rows.groupBy(_._1).foreach { case (c, rs) =>
      // ranks are contiguous from 0 (tokens fill left to right)
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (0L until ranks.size).toSeq,
        s"chunk $c ranks $ranks not contiguous from 0")
      rs.foreach { case (_, r, nd, fill, hd, hf) =>
        assert(nd >= 1 && fill >= 1 && fill <= 512)
        if (r == 0L) assert(hd == 0L && hf == 0L,
          s"chunk $c rank 0 must have no left halo")
        else {
          // the stream is contiguous, so a rank with core tokens has
          // its full 64-token halo resident to the left
          assert(hf == 64L, s"chunk $c rank $r halo fill $hf")
          assert(hd >= 1L)
        }
      }
      // every rank but the chunk's last is full; interior chunks tile
      // to exactly 2048
      val byRank = rs.sortBy(_._2)
      byRank.dropRight(1).foreach { case (_, r, _, fill, _, _) =>
        assert(fill == 512L, s"chunk $c rank $r not full")
      }
      if (c < lastChunk)
        assert(rs.map(_._4).sum == 2048L, s"chunk $c does not tile")
    }
    // the plan must exercise a document spanning a rank boundary
    // somewhere (otherwise the overlap arithmetic went untested)
    assert(rows.exists(r => r._3 >= 2), "no rank with a doc boundary")
  }

  test("train steps: strided DP assignment (bin ≡ worker mod 4), " +
    "full steps carry 2 micro-batches, mass refolds to the batches") {
    val df = q("pipeline_train_steps")
    PlanChecks.assertNoWideWindow(df)
    val rows = df
      .select("epoch", "step", "worker", "n_micro", "tokens",
        "first_bin", "last_bin")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, step, w, nm, _, fb, lb) =>
      assert(w >= 0 && w < 4 && nm >= 1 && nm <= 2)
      // the stride layout, pinned: a rank's bins are ≡ worker mod 4
      // inside its step's 8-bin range, 4 apart
      assert(fb % 4 == w && lb % 4 == w)
      assert(fb / 8 == step && lb / 8 == step)
      assert(lb - fb == 4 * (nm - 1))
    }
    // all steps but each epoch's last are fully accumulated
    rows.groupBy(_._1).foreach { case (e, rs) =>
      val lastStep = rs.map(_._2).max
      rs.filter(_._2 < lastStep).foreach { r =>
        assert(r._4 == 2L, s"epoch $e step ${r._2} not full")
      }
    }
    // token mass refolds exactly to the micro-batch frame
    val batches = q("pipeline_epoch_batches")
      .select("epoch", "n_tok").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val steps = rows.groupBy(_._1).view
      .mapValues(_.map(_._5).sum).toMap
    assert(steps == batches, "per-epoch token mass diverged")
  }

  test("quality frontier: monotone in the threshold, rising kept " +
    "mean, share arithmetic exact, sweep actually cuts the corpus") {
    val rows = q("pipeline_quality_frontier")
      .select("threshold_permil", "kept_docs", "kept_tokens",
        "kept_q_micro", "share_permil")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 5)
    val total = graft.Tables.documents(spark, sfDir)
      .select(graft.ext.TextAnalysis.nTokens(col("text")).as("nt"))
      .agg(sum("nt")).as[Long].head()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3 && hi._5 <= lo._5,
        "frontier not monotone")
      // a stricter gate never lowers the kept set's mean quality
      if (lo._2 > 0 && hi._2 > 0)
        assert(hi._4 * lo._2 >= lo._4 * hi._2,
          s"kept mean fell from ${lo._1} to ${hi._1}")
    }
    // the sweep must separate: not all thresholds keep everything,
    // not all keep nothing
    assert(rows.head._2 > rows.last._2 && rows.head._2 > 0)
    rows.foreach { r =>
      assert(r._5 == 1000L * r._3 / total,
        s"share arithmetic at ${r._1}")
    }
  }

  test("budget select: differential against an in-memory greedy, " +
    "half-budget boundary semantics, no corpus-scale window") {
    val df = q("pipeline_budget_select")
    PlanChecks.assertNoWideWindow(df)
    val got = df.select("source", "n_sel", "sel_tokens",
        "worst_q_micro")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // independent greedy over the same scored frame
    val scored = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        graft.ext.TextAnalysis.nTokens(col("text")).as("nt"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.lit(1000000.0) *
            graft.ext.TextAnalysis.qualityScore(col("text")))
          .cast("long").as("qm"))
      .as[(Long, String, Long, Long)].collect()
    val budget = scored.map(_._3).sum / 2
    var run = 0L
    val sel = scored.sortBy(r => (-r._4, r._1)).takeWhile { r =>
      val before = run; run += r._3; before < budget
    }
    val want = sel.groupBy(_._2).map { case (src, rs) =>
      src -> ((rs.length.toLong, rs.map(_._3).sum, rs.map(_._4).min))
    }
    assert(got == want, "selection diverged from the greedy")
    // boundary semantics: the selection spends at least the budget
    // (boundary doc included) but stops within one document of it
    val spent = sel.map(_._3).sum
    assert(spent >= budget && spent - budget < sel.map(_._3).max)
  }

  test("loader plan flagship: per-epoch mass equals the mixture " +
    "schedule's kept mass, stride invariants hold, selection bites") {
    val df = q("pipeline_loader_plan")
    PlanChecks.assertNoWideWindow(df)
    val rows = df
      .select("epoch", "step", "worker", "n_micro", "tokens",
        "first_bin", "last_bin")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, step, w, nm, _, fb, lb) =>
      assert(w >= 0 && w < 4 && nm >= 1 && nm <= 2)
      assert(fb % 4 == w && lb % 4 == w)
      assert(fb / 8 == step && lb / 8 == step)
      assert(lb - fb == 4 * (nm - 1))
    }
    // cross-query differential: every epoch trains exactly the
    // mixture schedule's kept token mass
    val keptTotal = q("pipeline_mixture_schedule")
      .select("kept_tokens").as[Long].collect().sum
    rows.groupBy(_._1).foreach { case (e, rs) =>
      assert(rs.map(_._5).sum == keptTotal,
        s"epoch $e mass != schedule's kept mass")
    }
    // and the selection actually removed mass vs the unselected plan
    val unselected = q("pipeline_train_steps")
      .select("tokens").as[Long].collect().sum
    assert(rows.map(_._5).sum < unselected, "selection vacuous")
  }
}
