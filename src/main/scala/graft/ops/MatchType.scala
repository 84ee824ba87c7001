package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's two-way match-type dispatch
  * (`upload_file.py:16-22`, CLI enum `{exact_match, regex_match}`), as a
  * Scala ADT compiling to a Catalyst predicate.
  *
  *  - [[ExactMatch]] — the reference skips listing entirely and addresses
  *    the single path `folder/file` directly (`download_file.py:227-237`):
  *    a point-lookup predicate Catalyst turns into partition/file pruning.
  *  - [[RegexMatch]] — Python `re.search` (UNANCHORED, substring) over the
  *    name (`upload_file.py:158-167`); Java `rlike` is also unanchored, so
  *    the semantics carry over exactly.
  */
sealed trait MatchType {
  /** Predicate over the catalog's match column (blob `name` for remote
    * scans, full `path` for local scans — mirroring the reference, which
    * matches blob names but local FULL paths). */
  def predicate(c: Column): Column
}

/** Point lookup on the combined `folder/file` path. */
final case class ExactMatch(fullPath: String) extends MatchType {
  def predicate(c: Column): Column = c === lit(fullPath)
}

/** Unanchored regex filter (F1). */
final case class RegexMatch(pattern: String) extends MatchType {
  def predicate(c: Column): Column = c.rlike(pattern)
}
