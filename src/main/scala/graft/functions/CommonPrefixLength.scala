package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `common_prefix_length(a, b)` — the number of leading CODE POINTS
  * the two strings share (0 when either is empty; min(len) when one is
  * a prefix of the other).
  *
  * Semantics identical to the built-in composition
  * `size(filter(sequence(1, least(length(a), length(b))), i ->
  * substring(a, 1, i) = substring(b, 1, i)))` — prefix equality is
  * downward closed, so the filter count IS the maximal equal prefix —
  * but that tree allocates and compares two fresh i-char substrings
  * per candidate length (O(n²) char work per pair) and the HOF wrapper
  * is CodegenFallback on top. This expression walks the two byte
  * arrays once and is callable from generated Java (the two-string
  * sibling of [[CharGrams]]). Used by the suffix-array LCP remainder
  * ([[graft.ext.SuffixArray]]), where each SA-adjacent pair closes its
  * sub-InitWidth remainder with exactly one such comparison.
  *
  * Counting is by code point (matching Spark's and DuckDB's `length`/
  * `substring` semantics on supplementary characters): the byte walk
  * stops at the first differing byte, then backs off to the last
  * complete code-point boundary — UTF-8 self-synchronizes, so equal
  * byte prefixes decode to equal code-point prefixes.
  */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_length"

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLength.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLength$$.MODULE$$" +
        s".compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLength {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CommonPrefixLength(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One linear byte pass. Equal UTF-8 byte prefixes are equal
    * code-point prefixes (self-synchronization), so: find the common
    * BYTE prefix, trim any trailing partial code point (a continuation
    * run whose lead byte sits inside the common region but whose
    * sequence diverges past it), then count code points in the kept
    * region — lead bytes are exactly the non-0b10xxxxxx bytes. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val max = math.min(ab.length, bb.length)
    var i = 0
    while (i < max && ab(i) == bb(i)) i += 1
    // back off to a code-point boundary: drop a trailing incomplete
    // sequence (its lead byte declares a length that runs past i only
    // when the tail bytes diverged — a complete equal sequence is kept)
    var end = i
    if (end < ab.length || end < bb.length) {
      var lead = end - 1
      while (lead >= 0 && (ab(lead) & 0xC0) == 0x80) lead -= 1
      if (lead >= 0) {
        val b0 = ab(lead) & 0xFF
        val seqLen =
          if (b0 < 0x80) 1
          else if (b0 < 0xE0) 2
          else if (b0 < 0xF0) 3
          else 4
        if (lead + seqLen > end) end = lead
      }
    }
    var cp = 0L
    var j = 0
    while (j < end) {
      if ((ab(j) & 0xC0) != 0x80) cp += 1
      j += 1
    }
    cp
  }
}
