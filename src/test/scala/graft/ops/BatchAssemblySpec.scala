package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchAssemblySpec extends SparkSpec {
  import spark.implicits._

  private def assemble(lens: Seq[(Long, Long)], b: Long) =
    BatchAssembly.lengthBucketedBatches(
      lens.toDF("id", "len"), col("len"), b, col("id"))
      .select("id", "bucket", "seq_in_bucket", "batch_idx")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("hand example: power-of-two bands, (len, id) order, fixed " +
    "fill, zero-length rows excluded") {
    // lens 1..10 + a zero: buckets are binary digit counts
    // (1 -> 1; 2,3 -> 2; 4..7 -> 3; 8..10 -> 4)
    val got = assemble((1L to 10L).map(i => (i, i)) :+ (99L, 0L), 2L)
    assert(!got.contains(99L))
    assert(got(1L) == (1, 1L, 0L))
    assert(got(2L) == (2, 1L, 0L) && got(3L) == (2, 2L, 0L))
    // bucket 3 holds 4,5,6,7: batches {4,5} and {6,7}
    assert(got(4L) == (3, 1L, 0L) && got(5L) == (3, 2L, 0L))
    assert(got(6L) == (3, 3L, 1L) && got(7L) == (3, 4L, 1L))
    // bucket 4 holds 8,9,10: {8,9} and the short tail {10}
    assert(got(8L) == (4, 1L, 0L) && got(9L) == (4, 2L, 0L))
    assert(got(10L) == (4, 3L, 1L))
  }

  test("ties on length break by the tie column — the assignment is a " +
    "total order") {
    val got = assemble(Seq((7L, 5L), (3L, 5L), (5L, 5L)), 2L)
    assert(got(3L)._2 == 1L && got(5L)._2 == 2L && got(7L)._2 == 3L)
    assert(got(3L)._3 == 0L && got(5L)._3 == 0L && got(7L)._3 == 1L)
  }

  test("assignment is partition-count independent (the PrefixSum " +
    "range-shuffle contract, not a single-reducer window)") {
    val lens = (1L to 200L).map(i => (i, (i * 37L) % 50L + 1L))
    val a = assemble(lens, 8L)
    val b = BatchAssembly.lengthBucketedBatches(
        lens.toDF("id", "len").repartition(13), col("len"), 8L,
        col("id"))
      .select("id", "bucket", "seq_in_bucket", "batch_idx")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(a == b)
  }

  test("bucketing reduces padding vs arrival-order batching on the " +
    "fixture corpus — the reason the operator exists") {
    val docs = graft.Tables.documents(spark, sfDir)
    val lens = docs.select(col("doc_id"),
      size(filter(graft.ext.TextAnalysis.tokens(col("text")),
        w => length(w) > 0)).cast("long").as("n_tokens"))
    def waste(df: org.apache.spark.sql.DataFrame,
        batchCols: Seq[String]): Long =
      df.groupBy(batchCols.map(col): _*)
        .agg((count(lit(1)) * max(col("n_tokens")) -
          sum(col("n_tokens"))).as("w"))
        .agg(sum(col("w"))).head().getLong(0)
    val bucketed = waste(
      BatchAssembly.lengthBucketedBatches(lens, col("n_tokens"), 16L,
        col("doc_id")),
      Seq("bucket", "batch_idx"))
    val arrival = waste(
      lens.filter(col("n_tokens") > 0)
        .withColumn("batch_idx", floor(col("doc_id") / 16L)),
      Seq("batch_idx"))
    assert(bucketed < arrival,
      s"bucketed=$bucketed arrival=$arrival")
  }

  test("packing-efficiency audit: consistent accounting across the " +
    "three strategies, and the ordering the design claims") {
    val rows = graft.SparkEntry.queries("pipeline_packing_efficiency")(
        spark, sfDir)
      .select("strategy", "units", "slots", "payload_tokens",
        "pad_tokens", "dropped_tokens", "eff_permil")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet ==
      Set("concat_chunk", "padded_solo", "length_bucketed"))
    rows.values.foreach { case (st, u, slots, pay, pad, _, eff) =>
      assert(u > 0 && slots > 0 && pay > 0)
      assert(pay + pad == slots, s"$st slots don't balance")
      assert(eff == 1000L * pay / slots, s"$st eff arithmetic")
    }
    // every strategy sees the same corpus: payload + dropped is the
    // same total token mass
    val masses = rows.values
      .map(r => r._4 + r._6).toSet
    assert(masses.size == 1, s"token mass diverged: $masses")
    // the design claim the audit exists to prove: bucketing beats the
    // naive padded-solo baseline, and nothing beats concat's slots
    // except via per-batch max < ctx
    assert(rows("length_bucketed")._7 > rows("padded_solo")._7)
    assert(rows("concat_chunk")._7 > rows("padded_solo")._7)
    // concat drops nothing and pads only the tail chunk (< ctx)
    assert(rows("concat_chunk")._6 == 0L &&
      rows("concat_chunk")._5 < 2048L)
  }
}
