package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a Bloom filter over the (already
  * filtered) dimension keys, broadcast it, and drop fact rows that
  * cannot join BEFORE the fact side shuffles. The real equi-join still
  * runs afterwards, so false positives cost nothing but a few extra
  * shuffled rows — results are exact.
  *
  * Why it matters at 100 TB: a selective dim predicate (say 1/5 of
  * customers) normally does nothing for the fact shuffle — every orders
  * row is hashed and written regardless. The Bloom pre-filter turns the
  * dim predicate into a fact-scan-side filter at a few bytes per key,
  * cutting shuffle I/O roughly by the dim selectivity (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies the same idea when
  * it fires; this operator makes it explicit and unconditional).
  *
  * The probe is Catalyst's own codegen'd `BloomFilterMightContain`
  * (what `spark.sql.optimizer.runtime.bloomFilter` injects), reached
  * through the `ColumnBridge` shim since it has no public Column form:
  * the serialized sketch rides the plan as a foldable binary literal
  * (deserialized once per task, exactly like the subquery result in
  * Spark's own rewrite) and the probe compiles into the scan's
  * whole-stage-codegen'd filter — no per-row boxing, no `ScalaUDF`
  * island in the hot path.
  */
object BloomPrune {

  /** Equi-join `fact` to `dim` on long keys, Bloom-pruning the fact side
    * first. `expectedItems <= 0` sizes the filter with a dim count (one
    * cheap extra job on the small side; pass an estimate at scale to
    * skip it). */
  def prunedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val longTypes = Set("bigint", "int", "smallint", "tinyint")
    require(longTypes.contains(
      fact.schema(factKey).dataType.simpleString) &&
      longTypes.contains(dim.schema(dimKey).dataType.simpleString),
      s"prunedEquiJoin prunes integral keys; got " +
        s"${fact.schema(factKey).dataType.simpleString}/" +
        s"${dim.schema(dimKey).dataType.simpleString}")
    // Spark's bloomFilter aggregate NPEs on zero input rows (null
    // buffer in BloomFilter.readFrom) — an empty dim legitimately
    // happens when the dim predicate matches nothing, and the right
    // answer is an empty join, not a crash
    if (dim.isEmpty)
      return fact.filter(lit(false))
        .join(dim, fact(factKey) === dim(dimKey))
    val n = if (expectedItems > 0) expectedItems else dim.count()
    val bloom = dim.stat.bloomFilter(dimKey, math.max(n, 1L), fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    val mightContain = org.apache.spark.sql.graftx.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bytes.toByteArray,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graftx.ColumnBridge.expression(
          col(factKey).cast("long"))))
    fact.filter(col(factKey).isNotNull && mightContain)
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
