package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.regex.{Matcher, Pattern}

/** `regexp_replace_first(str, regex, replacement)` — replace only the FIRST
  * regex match, i.e. Python `re.sub(pat, repl, s, count=1)` semantics.
  *
  * Spark's built-in `regexp_replace` replaces ALL matches; the reference's
  * enumerated-rename step needs replace-first (it injects `_<n>` before the
  * first `.` of a file name — see `/root/reference/azurestorage_blueprints/
  * upload_file.py:70-81`). This is the one true impedance mismatch between
  * the reference's string algebra and `org.apache.spark.sql.functions`, so
  * it gets the engine's one custom scalar Catalyst expression.
  *
  * Replacement-string semantics follow Java `Matcher.replaceFirst` (`$1`
  * group references, `\` escapes) — the same convention as Spark's own
  * `RegExpReplace`. Codegen: full `doGenCode` with per-instance cached
  * pattern, so the expression stays inside whole-stage codegen.
  */
case class RegExpReplaceFirst(subject: Expression, regexp: Expression, rep: Expression)
    extends TernaryExpression {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep

  override def dataType: DataType = StringType
  override def nullable: Boolean =
    subject.nullable || regexp.nullable || rep.nullable
  override def prettyName: String = "regexp_replace_first"

  // cache the compiled pattern across rows when the regex is constant
  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val regexStr = p.asInstanceOf[UTF8String]
    if (!regexStr.equals(lastRegex)) {
      lastRegex = regexStr.clone()
      pattern = Pattern.compile(regexStr.toString)
    }
    val m: Matcher = pattern.matcher(s.toString)
    UTF8String.fromString(m.replaceFirst(r.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternCls = classOf[Pattern].getName
    val lastRegexField = ctx.addMutableState("UTF8String", "lastRegexRF")
    val patternField = ctx.addMutableState(patternCls, "patternRF")
    nullSafeCodeGen(ctx, ev, (subj, rgx, repl) => {
      s"""
         |if (!$rgx.equals($lastRegexField)) {
         |  $lastRegexField = $rgx.clone();
         |  $patternField = $patternCls.compile($rgx.toString());
         |}
         |${ev.value} = UTF8String.fromString(
         |  $patternField.matcher($subj.toString()).replaceFirst($repl.toString()));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)
}

object RegExpReplaceFirst {
  import org.apache.spark.sql.graftx.ColumnBridge
  /** Column-level entry point. */
  def apply(str: Column, regex: Column, replacement: Column): Column =
    ColumnBridge.column(RegExpReplaceFirst(
      ColumnBridge.expression(str),
      ColumnBridge.expression(regex),
      ColumnBridge.expression(replacement)))
}
