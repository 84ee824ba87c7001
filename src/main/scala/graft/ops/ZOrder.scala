package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys — the multi-dimensional data-LAYOUT operator.
  *
  * A 100 TB table is pruned through per-file min/max statistics; sorting
  * by one column makes files tight in THAT column and useless for any
  * other. Interleaving the bits of two dimensions into one sort key
  * makes every run of 4^k consecutive keys an exact 2^k × 2^k tile:
  * range-partition + sort by the z-key and every file's (min, max)
  * covers a SMALL RANGE IN BOTH dimensions, so scans with a predicate on
  * either dimension (or both) skip all but the touched tiles. This is
  * the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as a
  * plain column expression plus Spark's own range partitioner — no
  * custom writer needed.
  *
  * The key is pure integer bit algebra (shifts, masks, adds over
  * disjoint bits), codegen'd on the Spark side and replayed exactly by
  * any engine with `>> & <<` — oracle-checkable, like every other
  * operator here.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: dimension `a` occupies even bit positions, `b` odd. The
    * per-bit terms touch disjoint output bits, so summing them IS the
    * bitwise OR — kept as `+` because both engines fold integer adds.
    * Caller guarantees `0 <= a, b < 2^bits` (mask upstream; values
    * beyond the range would alias tiles). */
  def zkey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zkey: bits in [1,31] ($bits)")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The SQL text of [[zkey]] for an external replay (oracle parity —
    * same shift/mask/add algebra, token for token). */
  def zkeySql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Lay a frame out in z-order: range-partition on the key (each
    * output file covers one contiguous z-range = a bounded tile in both
    * dims), sort within partitions so row groups inherit the bound.
    * `partitions` ~ target file count; the z column is kept for
    * inspection and dropped by writers that don't want it. */
  def layout(df: DataFrame, a: Column, b: Column, bits: Int,
      partitions: Int, zCol: String = "z_key"): DataFrame =
    df.withColumn(zCol, zkey(a, b, bits))
      .repartitionByRange(partitions, col(zCol))
      .sortWithinPartitions(zCol)
}
