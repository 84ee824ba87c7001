package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_grams(text, n)` — ALL character n-grams in positional order,
  * counted by code point.
  *
  * Semantics identical to the built-in composition
  * `transform(sequence(0, length(s)-n), i -> substring(s, 1+i, n))`
  * (empty array when the string is shorter than n) — but `substring`
  * at a DYNAMIC position on a UTF-8 string walks the bytes from the
  * start every call, so that tree is O(len) per gram = O(len²) per
  * document, and the HOF wrapper is CodegenFallback on top. Measured
  * on the language-ID path: the gram explode alone cost 16 s at sf0.1
  * (1.2M grams over 4k docs). This expression slides one window over
  * the bytes in a single linear pass and is callable from generated
  * Java (the char-level sibling of [[WordShinglesAt]]).
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "char gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_grams"

  override def nullSafeEval(s: Any): Any =
    CharGrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGrams$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGrams {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(text), n))

  /** One linear pass: a sliding [start, end) code-point window over the
    * Java string (offsetByCodePoints steps one code point at a time, so
    * the whole scan touches each char O(1) times — matching Spark's and
    * DuckDB's code-point substring semantics on supplementary chars). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cpCount - n + 1)
    var startIdx = 0
    var endIdx = s.offsetByCodePoints(0, n)
    var i = 0
    while (i <= cpCount - n) {
      out(i) = UTF8String.fromString(s.substring(startIdx, endIdx))
      if (i < cpCount - n) {
        startIdx = s.offsetByCodePoints(startIdx, 1)
        endIdx = s.offsetByCodePoints(endIdx, 1)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
