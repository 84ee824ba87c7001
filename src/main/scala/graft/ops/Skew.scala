package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 physical notes; the 100 TB
  * design lever for hot keys that AQE's skew-join splitting doesn't
  * reach, e.g. a shuffle-hash join keyed on a power-law column).
  *
  * `saltedEquiJoin` replicates the SMALL side `buckets` times and
  * scatters the large side uniformly across the replicas, so one hot key
  * spreads over `buckets` reducers. Result is exactly the plain
  * equi-join for large-side-preserving join types (salt values cancel in
  * the join condition). Right/full outer joins are rejected: each
  * unmatched small-side row would surface once per salt replica.
  */
object Skew {

  private val LargeSidePreserving =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "semi", "left_anti", "leftanti", "anti")

  def saltedEquiJoin(
      large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    require(LargeSidePreserving(joinType.toLowerCase.replace(" ", "_")),
      s"saltedEquiJoin supports only large-side-preserving join types " +
      s"(${LargeSidePreserving.mkString(", ")}); got '$joinType' — " +
      "replicating the small side would duplicate its unmatched rows")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val expanded = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
