package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `long_bitset_from_positions(positions, numWords)` — dense
  * `array<bigint>` bitmask of `numWords` 64-bit words with bit `p` set
  * for every element `p` of `positions` (0-based, duplicates idempotent).
  *
  * The wide-vocabulary mask build of [[graft.ext.Dedup.tokenMasks]]
  * previously densified through `transform(sequence(0, numWords-1), w ->
  * coalesce(element_at(wordmap, w), 0))` over a `map_from_entries`
  * aggregate — a higher-order-function tree Spark evaluates as
  * `CodegenFallback` (interpreted, one closure dispatch + map probe per
  * word), fed by a SECOND (id, word)-keyed aggregate. This expression
  * builds the mask in one pass of direct array code from the doc's bit
  * positions, so the mask build needs ONE id-keyed aggregate and stays
  * inside whole-stage codegen.
  *
  * Contract: every position must lie in `[0, numWords*64)` — positions
  * come from a vocabulary ordinal bounded by the caller (tokenMasks'
  * `require(nVocab <= 2^20)`), so an out-of-range value is a broken
  * ordinal and fails loudly rather than corrupting masks.
  */
case class LongBitsetFromPositions(child: Expression, numWords: Int)
    extends UnaryExpression {
  require(numWords >= 1, "numWords must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "long_bitset_from_positions"

  override def nullSafeEval(a: Any): Any =
    LongBitsetFromPositions.compute(a.asInstanceOf[ArrayData], numWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LongBitsetFromPositions$$.MODULE$$" +
        s".compute($c, $numWords);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongBitsetFromPositions {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(positions: Column, numWords: Int): Column =
    ColumnBridge.column(LongBitsetFromPositions(
      ColumnBridge.expression(positions), numWords))

  def compute(positions: ArrayData, numWords: Int): GenericArrayData = {
    val words = new Array[Long](numWords)
    val n = positions.numElements()
    var i = 0
    while (i < n) {
      val p = positions.getLong(i)
      if (p < 0L || p >= numWords.toLong * 64L)
        throw new IllegalArgumentException(
          s"long_bitset_from_positions: position $p outside " +
            s"[0, ${numWords.toLong * 64L}) — corrupt vocabulary ordinal")
      words((p >>> 6).toInt) |= 1L << (p & 63L)
      i += 1
    }
    new GenericArrayData(words)
  }
}
