package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` — DISTINCT ordered word n-grams of a
  * space-separated token stream, first-occurrence order.
  *
  * Semantics identical to the built-in composition
  * `array_distinct(transform(sequence(0, size(toks)-n), i ->
  * array_join(slice(toks, i+1, n), " ")))` — but that tree is a
  * higher-order function, which Spark evaluates as `CodegenFallback`
  * (interpreted, one closure dispatch per element, an intermediate array
  * per lambda). Shingling runs once per corpus document on the dedup /
  * decontamination hot path, so this expression does the whole job in
  * one pass of direct string code and stays callable from generated
  * Java (single static call — whole-stage codegen keeps the enclosing
  * plan fused). ~10x on the contamination scan.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(s: Any): Any =
    WordShingles.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_shingles_at(text, n)` — ALL word n-grams in POSITIONAL order
  * (element i is the n-gram starting at token i), the companion of
  * [[WordShingles]] for operators that need the start offset back —
  * `posexplode` of this array yields (start, shingle) directly. Same
  * single-pass direct string code and codegen story as WordShingles
  * (the `transform(sequence(...), slice...)` composition it replaces is
  * CodegenFallback); no dedup, so a run repeated inside one document
  * keeps every occurrence — exactly what substring-removal needs. */
case class WordShinglesAt(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_at"

  override def nullSafeEval(s: Any): Any =
    WordShinglesAt.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesAt$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesAt {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesAt(ColumnBridge.expression(text), n))

  /** Split on single spaces (`split(text, ' ')` parity); element i is
    * tokens [i, i+n) joined by one space; empty array if fewer than n
    * tokens. */
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

object WordShingles {
  import org.apache.spark.sql.graftx.ColumnBridge

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Split on single spaces (trailing empties kept — `split(text, ' ')`
    * parity), emit distinct n-grams joined by one space. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
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
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
