package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` — Unicode canonical composition (NFC), the
  * standard first text-normalization stage of a crawl ingest: the web
  * mixes composed ("é" U+00E9) and decomposed ("e"+U+0301) spellings
  * of identical text, and every downstream EXACT operator — content
  * hashes, exact dedup, token equality, wordlist matching — silently
  * treats them as different documents/words until the corpus is
  * canonicalized. Run it before hashing, not after.
  *
  * Spark has no built-in (`org.apache.spark.sql.functions` offers
  * none), so this is a codegen'd unary expression over the JDK's
  * `java.text.Normalizer` — the same Unicode normalization tables
  * DuckDB's `nfc_normalize` implements, so an oracle replays results
  * exactly. The fast path matters at scale: `Normalizer.isNormalized`
  * is a cheap scan that returns true for virtually all real text
  * (ASCII trivially), and when it holds the input UTF8String is
  * returned AS-IS — zero allocation, no UTF-16 round-trip — so the
  * expression costs one quick-check pass on the hot path and only
  * pays the full normalize on the rare decomposed document.
  */
case class NfcNormalize(child: Expression, form: String = "NFC")
    extends UnaryExpression {

  require(NfcNormalize.Forms.contains(form),
    s"unicode_normalize: unknown form $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("nfForm", form, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c, $f)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graftx.ColumnBridge

  /** NFC composes canonically; NFKC additionally folds compatibility
    * characters (ligatures, fullwidth forms, superscripts) — the
    * common LLM-tokenizer preprocessing choice. NFD/NFKD exposed for
    * completeness (some pipelines strip diacritics by decomposing and
    * dropping marks). */
  val Forms: Set[String] = Set("NFC", "NFKC", "NFD", "NFKD")

  /** Shared by interpreted eval and generated code (one body — the
    * two paths cannot diverge). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  def apply(c: Column): Column = apply(c, "NFC")

  def apply(c: Column, form: String): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c), form))
}
