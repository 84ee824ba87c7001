package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates for pipeline boundaries: declarative row
  * constraints verified in ONE scan, uniqueness/referential checks as
  * keyed aggregates, and a bucketed hash reconciliation for comparing
  * two table versions without shipping either.
  *
  * The design constraint throughout is single-pass-ness: a 100 TB
  * validation must not run one job per rule. Row constraints compile to
  * `sum(case when violated)` columns inside one aggregate (Spark
  * evaluates all of them in the same WholeStageCodegen pass);
  * cross-row rules (unique, referential) are each one keyed hash-agg /
  * anti-join — the shapes that already scale everywhere else in this
  * library.
  */
object DataQuality {

  /** A named row-level rule: a row VIOLATES it when `holds` is false
    * (nulls count as violations — write `col.isNull || pred` to exempt
    * them explicitly). */
  final case class RowRule(name: String, holds: Column)

  /** All row rules in one scan: returns one row per rule —
    * (rule, n_violations, n_rows) — from a single aggregate (the
    * long format comes from a k-row stack of the agg result, not k
    * jobs). */
  def checkRows(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "checkRows: at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map { r =>
      sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L))
        .as(s"__v_${r.name}")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { r =>
      one.select(lit(r.name).as("rule"),
        col(s"__v_${r.name}").as("n_violations"), col("__n").as("n_rows"))
    }
    stacked.reduce(_.unionByName(_))
  }

  /** Duplicate-key audit: (rule, n_violations, n_rows) where a
    * violation is any row beyond the first per key. One keyed
    * hash-agg. */
  def uniqueKey(df: DataFrame, name: String,
      keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(lit(name).as("rule"), col("n_violations"),
        col("n_rows"))

  /** Referential-integrity audit: child rows whose key has no match in
    * `parent`. Left-anti join on the key — broadcastable when the
    * parent key set is small, shuffle-partitioned otherwise (AQE
    * decides, like every other join here). */
  def referential(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    orphans.crossJoin(broadcast(total))
      .select(lit(name).as("rule"), col("n_violations"),
        col("n_rows"))
  }

  /** Bucketed hash reconciliation of two table versions (the Merkle-
    * shard diff): rows hash into `buckets` by key, each side folds to a
    * per-bucket (count, order-independent hash sum), and only buckets
    * whose folds disagree surface. Neither table ever crosses the
    * network beyond its k-row bucket summary — THE shape for "did the
    * migration/back-fill change anything, and where" at 100 TB. The row
    * hash must cover every audited column; hash sums are mod-P int64 so
    * they commute across partitions and engines.
    *
    * Returns mismatching buckets only: (bucket, n_a, n_b, h_a, h_b). */
  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
      rowHash: Column, buckets: Int = 1024): DataFrame = {
    val P = 1000000007L
    def fold(df: DataFrame, nc: String, hc: String) = df
      .select(pmod(col(keyCol), lit(buckets)).cast("long").as("bucket"),
        rowHash.as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as(nc), pmod(sum(col("__h")), lit(P)).as(hc))
    fold(a, "n_a", "h_a")
      .join(fold(b, "n_b", "h_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("h_a"), lit(-1L)).as("h_a"),
        coalesce(col("h_b"), lit(-1L)).as("h_b"))
      .filter(col("n_a") =!= col("n_b") || col("h_a") =!= col("h_b"))
  }

  /** One-pass column profiler — the "what is in this table" report a
    * pipeline runs before trusting a new 100 TB drop: per column, row
    * and null counts, lexicographic min/max of the string rendering,
    * and a KMV distinct ESTIMATE (exact below k). ONE generator
    * projection stacks the columns long-format (k rows per input row,
    * map-side), then one col-keyed aggregate + the bottom-k sketch —
    * never one job per column, never unbounded agg state. Columns are
    * profiled via `CAST(x AS STRING)` identity, so pass only columns
    * whose rendering is engine-stable (integers, strings, dates —
    * never raw doubles). Returns (col_name, n_rows, n_nulls, min_v,
    * max_v, n_kept, kth_hash, est_distinct). */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    val base = stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
      min("v").as("min_v"), max("v").as("max_v"))
    val sk = graft.ext.Sketches.kmvDistinct(
      stacked.filter(col("v").isNotNull)
        .select(col("col_name"),
          graft.ext.TextAnalysis.tokenHash31(col("v")).as("h")),
      Seq("col_name"), "h", k)
    // left join: an all-null column still profiles (empty sketch)
    base.join(sk, Seq("col_name"), "left_outer")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kth_hash"), lit(-1L)).as("kth_hash"),
        coalesce(col("est_distinct"), lit(0.0)).as("est_distinct"))
  }

  /** Key-skew diagnostic — the pre-join report that decides whether a
    * 100 TB shuffle needs salting: per-key row counts, each key's
    * corpus share, and its skew ratio against the uniform expectation
    * (cnt·n_keys/total — 1e6 ≈ perfectly uniform; the salting
    * heuristic fires when the hottest key's ratio crosses ~10×). ONE
    * keyed hash-agg (map-side combined) plus a 1-row scalar broadcast;
    * the top-N sort runs on the already-aggregated key table. Shares
    * are floor(1e6·x) integers, so the report replays exactly on any
    * engine. Returns the top-N hottest keys:
    * (rnk, key, cnt, share_micro, skew_micro). */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perKey = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(sum("cnt").cast("long").as("total"),
      count(lit(1)).as("n_keys"))
    // topN rows in one partition by construction — the one safe window
    perKey.orderBy(col("cnt").desc, col("key")).limit(topN)
      .crossJoin(broadcast(totals))
      .select(
        row_number().over(Window.orderBy(col("cnt").desc, col("key")))
          .cast("long").as("rnk"),
        col("key"), col("cnt"),
        floor(col("cnt") * lit(1000000.0) / col("total"))
          .cast("long").as("share_micro"),
        floor(col("cnt") * col("n_keys") * lit(1000000.0) / col("total"))
          .cast("long").as("skew_micro"))
  }
}
