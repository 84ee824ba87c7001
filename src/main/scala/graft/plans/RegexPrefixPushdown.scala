package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: an anchored-literal-prefix regex filter gains a
  * `StartsWith` conjunct that data sources CAN push down.
  *
  * The engine's own F1 pattern (`name rlike '^logs/2024/.*\.log'`) is a
  * full-scan residual filter in vanilla Spark — `RLike` never reaches
  * `PushedFilters`. The reference pushes the prefix server-side
  * (`list_blobs(prefix=...)`, `download_file.py:151`); this rule recovers
  * the same pushdown declaratively: it extracts the longest LITERAL
  * prefix after `^` and rewrites
  *
  *   rlike(x, '^logs/2024/.*\.log')
  *     ==> startswith(x, 'logs/2024/') AND rlike(x, '^logs/2024/.*\.log')
  *
  * `StartsWith` translates to a parquet/ORC `StringStartsWith` pushed
  * filter (row-group pruning via min/max) and to a prefix-addressed
  * listing on catalog sources; the original RLike stays as the exact
  * residual. Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`).
  */
object RegexPrefixPushdown extends Rule[LogicalPlan] {

  /** regex metacharacters that end the literal prefix */
  private val Meta = "\\^$.|?*+()[]{}".toSet

  /** Longest literal prefix of an `^`-anchored pattern; None if the
    * pattern isn't anchored or has no literal head. Escapes (`\x`) stop
    * the scan conservatively (only plain literal chars are taken). */
  private[plans] def literalPrefix(pattern: String): Option[String] = {
    if (!pattern.startsWith("^")) return None
    // top-level alternation voids the anchor for later branches
    // (`^logs/|tmp/` matches 'tmp/x' anywhere) — bail on any '|',
    // conservatively including parenthesized ones
    if (pattern.contains('|')) return None
    val sb = new StringBuilder
    var i = 1
    var done = false
    while (i < pattern.length && !done) {
      val c = pattern.charAt(i)
      if (Meta.contains(c) || c == '\\') done = true
      else { sb += c; i += 1 }
    }
    // a trailing quantifier binds to the LAST literal char — drop it
    val quantNext = i < pattern.length && "?*+{".contains(pattern.charAt(i))
    val p = if (quantNext && sb.nonEmpty) sb.dropRight(1) else sb
    if (p.isEmpty) None else Some(p.toString)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // idempotence guard: the optimizer iterates to a fixed point, so
      // don't re-add a StartsWith conjunct that is already present
      val existing: Set[(Expression, String)] = cond.collect {
        case StartsWith(a, Literal(s: UTF8String, StringType)) =>
          (a.canonicalized, s.toString)
      }.toSet
      val rewritten = cond.transformUp {
        case rl @ RLike(attr, Literal(p: UTF8String, StringType))
            if attr.deterministic =>
          literalPrefix(p.toString) match {
            case Some(prefix)
                if !existing.contains((attr.canonicalized, prefix)) =>
              And(StartsWith(attr, Literal(UTF8String.fromString(prefix),
                StringType)), rl)
            case _ => rl
          }
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
