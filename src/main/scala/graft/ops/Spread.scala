package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Spread an expensive per-row compute stage across the cluster.
  *
  * Narrow map stages inherit their parallelism from upstream, which is
  * sized by BYTES — file splits (`maxPartitionBytes`), AQE advisory
  * partition sizes — because bytes are what exchanges and scans can
  * observe. When the per-row work is orders of magnitude more expensive
  * than moving the row (regex/HTML parsing, zlib compression probes,
  * tokenizer encode loops, media-container walks: µs-to-ms per row,
  * versus ns-per-byte for a shuffle), byte-sized partitioning serializes
  * the stage on a handful of tasks — one near-empty input split can
  * carry seconds of parse work while the rest of the cluster idles, and
  * the stage stops scaling with cores entirely (the same Θ(work) ≠
  * Θ(bytes) mismatch as a similarity join's candidate fan-out).
  *
  * One hash exchange on the row key buys compute-proportional
  * parallelism; the exchange is keyed (no round-robin pre-sort, no
  * retry-nondeterminism — SPARK-38388 class) and deterministic. Results
  * are row-identical under any placement; only task boundaries move.
  */
object Spread {

  /** Repartition `df` to the session's default parallelism, hashed on
    * `keys` (callers pass the row id so placement is deterministic). */
  def forCompute(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
  }
}
