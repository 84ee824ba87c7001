package graft.queries

/** Oracle-SQL fragments shared across the query modules — one home
  * for the pieces that MUST stay identical between families (a
  * checksum formula or rejoin algebra that drifted per-module would
  * silently diverge the graded constants). */
private[queries] object OracleSql {

  /** 31-bit integer hash of a SQL string expression via md5 — the
    * DuckDB twin of [[graft.ext.TextAnalysis.tokenHash31Local]];
    * checksum columns in the store grades sum it over table rows. */
  def h31(t: String): String =
    s"(('0x' || substring(md5($t), 1, 15))::BIGINT % 2147483647)"

  /** Per-document words in position order — CTE `dw` (doc_id, i,
    * w). The word filter must match the family's encode contract
    * (the unigram lattice excludes over-budget words; WordPiece
    * takes every word). */
  def docWords(wordFilter: String = "length(v) > 0",
      wordMap: Option[String] = None): String = {
    val base = s"list_filter(string_split(text, ' '), v -> $wordFilter)"
    val ws = wordMap.fold(base)(m => s"list_transform($base,\n          v -> $m)")
    s"""dw AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, ws[i] AS w
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
    FROM (SELECT doc_id,
        $ws AS ws
      FROM documents)))"""
  }

  /** Token-stream reassembly of `dw` against a per-distinct-word
    * segmentation CTE — CTE `enc` (doc_id, toks). */
  def encJoin(segTable: String, segCol: String): String =
    s"""enc AS (
  SELECT d.doc_id, flatten(list(s.$segCol ORDER BY d.i)) AS toks
  FROM dw d JOIN $segTable s ON s.word = d.w
  GROUP BY 1)"""

  /** [[docWords]] + [[encJoin]] — the full per-document rejoin. */
  def encDoc(segTable: String, segCol: String,
      wordFilter: String = "length(v) > 0"): String =
    docWords(wordFilter) + ",\n" + encJoin(segTable, segCol)
}
