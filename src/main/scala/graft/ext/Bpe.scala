package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TOKENIZER TRAINING as a distributed pipeline —
  * the Sennrich et al. 2016 learn loop re-expressed Spark-first.
  *
  * The scale shape (why this survives 100 TB):
  *
  *  - the corpus is touched ONCE, by the word-frequency aggregation
  *    (word-keyed shuffle with map-side combine — the classic
  *    word-count). Every training iteration after that runs on the
  *    VOCABULARY table, which is corpus-size-independent (Heaps' law:
  *    ~10^6-10^8 rows at web scale vs 10^11 documents);
  *  - per iteration: one pair-count aggregation over the vocab table
  *    (pair-keyed, map-side combined, ≤ |pairs| rows after partials)
  *    and a ONE-ROW collect of the argmax — the merge table is the
  *    bounded driver state (numMerges rows), exactly the k-means /
  *    GD-weights carve-out;
  *  - applying a merge is a map-only string `replace` on the vocab
  *    table (persisted, previous iteration unpersisted);
  *  - ENCODING with a learned merge table is map-only: the merges ride
  *    the plan as `numMerges` nested literal `replace` calls per word
  *    — no join, no shuffle, no per-row driver anything.
  *
  * Symbol streams are encoded as DELIMITED STRINGS — `" a  b  c "`:
  * every symbol bounded by one space on each side, TWO spaces between
  * adjacent symbols. On this form, plain left-to-right non-overlapping
  * `replace(w, " a  b ", " ab ")` IS greedy BPE pair-merging:
  *
  *  - the single-space edges force whole-symbol matches (a pattern
  *    can never bind to the suffix/prefix of a longer symbol);
  *  - the double-space interior means ADJACENT merge sites do not
  *    share a delimiter, so `[a,b,a,b]` merges both sites in one
  *    pass, and overlapping runs like `[a,a,a,a,a]` merge to
  *    `[aa,aa,a]` — byte-for-byte the reference greedy semantics;
  *  - `replace` has identical left-to-right non-overlapping semantics
  *    in Spark and every ANSI engine, so a SQL oracle replays the
  *    whole train loop exactly.
  *
  * Merges apply in RANK ORDER, one global pass each — the learn-time
  * evolution of the corpus (subword-nmt's `learn_bpe`). An
  * iterate-lowest-rank encoder (HuggingFace) differs only on unseen
  * words where a later merge creates an earlier-rank pair; rank-order
  * application is deterministic, stateless and SQL-replayable, which
  * is what a data pipeline needs.
  *
  * Words must not contain the delimiter (guaranteed by whitespace
  * tokenization). All arithmetic is integral — counts, ranks — so
  * results are bit-identical under any partitioning.
  */
object Bpe {

  /** One learned merge: at `rank`, symbols `(left, right)` fused into
    * `left+right`; `freq` is the weighted pair count that won. */
  final case class Merge(rank: Int, left: String, right: String,
      freq: Long)

  /** A word exploded to its initial character symbols in delimited
    * form: `"abc"` -> `" a  b  c "`. Codegen'd regexp (each codepoint
    * -> ` $1 `; adjacent pads fuse into the double-space interior). */
  def delimit(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** The delimited-form pattern/replacement of one merge. */
  private def pat(m: Merge): String = s" ${m.left}  ${m.right} "
  private def rep(m: Merge): String = s" ${m.left}${m.right} "

  /** Symbol array of a delimited string (split on the double-space
    * interior after trimming the single-space edges). */
  def symbols(w: Column): Column = split(trim(w, " "), "  ")

  /** Word-frequency table `(word, freq)` — the ONE corpus-scale pass.
    * Empty tokens (leading/trailing/double separators) are dropped. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges from a `(word, freq)` table. Each
    * iteration: weighted adjacent-pair count over the vocab table,
    * deterministic argmax (count desc, then left/right lexicographic
    * — binary collation in both engines), map-only merge apply.
    * Stops early when no pair reaches `minFreq`. */
  def train(words: DataFrame, numMerges: Int, minFreq: Long = 1L)
      : Seq[Merge] = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"Bpe.train: numMerges in [1,4096] ($numMerges)")
    require(minFreq >= 1L, s"Bpe.train: minFreq >= 1 ($minFreq)")
    // ONE Spark job per iteration: the pair-count argmax job is also
    // what materializes the current iteration's (lazily
    // local-checkpointed) vocab. localCheckpoint — not persist —
    // because a persisted iterate's plan EMBEDS its parent's whole
    // tree: by iteration k analysis, canonicalization and cache
    // lookup walk an O(k)-deep nest, an O(k^2) driver tax.
    // The checkpoint truncates each iterate to a flat RDD scan, so
    // iteration cost is constant. (Executor loss mid-train would
    // fail the job — at cluster scale hand a reliable checkpointDir
    // to the session, same opt-in as the graph ops.)
    var cur = words
      .select(delimit(col("word")).as("w"), col("freq"))
      .coalesce(1)
      .localCheckpoint(false)
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // pairs of ADJACENT symbols, weighted by word frequency; a
      // word with a repeated pair contributes once per position.
      // size guard first: Spark's sequence(1, 0) is DESCENDING.
      val best = cur
        .select(symbols(col("w")).as("l"), col("freq"))
        .filter(size(col("l")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(l) - 1)," +
            " i -> struct(l[i-1] AS a, l[i] AS b))")).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minFreq) done = true
      else {
        val m = Merge(rank, best(0).getString(0),
          best(0).getString(1), best(0).getLong(2))
        out += m
        cur = cur
          .select(
            call_function("replace", col("w"), lit(pat(m)),
              lit(rep(m))).as("w"),
            col("freq"))
          .localCheckpoint(false)
        rank += 1
      }
    }
    out.result()
  }

  /** The learned merge table as a DataFrame `(merge_rank, lhs, rhs,
    * freq)` — the artifact a tokenizer ships. (`left`/`right` are SQL
    * keywords; the aliases keep every engine happy.) */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** Encode ONE word column with a learned merge list: the delimited
    * form runs through `merges.size` literal `replace` calls in rank
    * order, then splits back to the token array. Pure string
    * expressions — map-only, no state, no shuffle. */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    symbols(merges.foldLeft(delimit(word)) { (acc, m) =>
      call_function("replace", acc, lit(pat(m)), lit(rep(m)))
    })

  /** Per-document subword tokenization: whitespace words each encoded
    * with [[encodeWord]], flattened to one token array per document.
    * The merge table rides the plan as literals — the encode of a
    * 100 TB corpus is a single map-only pass. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(col(idCol),
      flatten(transform(
        filter(TextAnalysis.tokens(col(textCol)),
          w => length(w) > 0),
        w => encodeWord(w, merges))).as("tokens"))
}
