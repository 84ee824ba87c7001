package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(text, n)` — ALL ordered word n-grams of a space-separated
  * token stream, repeats kept, document order preserved.
  *
  * The non-distinct sibling of [[WordShingles]]: repetition-quality
  * signals (duplicate-n-gram fraction, top-n-gram coverage — the
  * Gopher-style filters) need every occurrence, not the distinct set, so
  * a `LinkedHashSet` dedup would destroy exactly the counts being
  * measured. Same single-pass direct string code, same static-call
  * codegen so the enclosing projection stays inside whole-stage codegen.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(s: Any): Any =
    WordGrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGrams$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n))

  /** Split on single spaces (trailing empties kept — `split(text, ' ')`
    * parity with [[WordShingles.compute]]), emit every n-gram joined by
    * one space, in document order. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
