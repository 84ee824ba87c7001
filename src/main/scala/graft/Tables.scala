package graft

import org.apache.spark.sql.{DataFrame, SparkSession, types}

/** Loaders for the driver-generated tabular fixtures (TESTDATA.md).
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)` and loads
  * from `$sfDir/<table>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Schema-adaptive events loader. The fixture's `ts` physical encoding
    * has drifted across driver regenerations (TIMESTAMP(NANOS) int64 →
    * timestamp[us]); a 100 TB lake sees exactly this kind of drift, so the
    * loader branches on the LOADED dtype instead of hard-coding one
    * encoding. Every branch yields TIMESTAMP_LTZ whose `unix_micros` equals
    * the raw file micros — the same integers DuckDB's `epoch_us(ts)` oracle
    * reads — independent of the session time zone:
    *   - LongType (TIMESTAMP(NANOS) via the nanosAsLong legacy conf, or a
    *     plain int64 of epoch-nanos): exact integer `div 1000` → micros.
    *   - TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false): the file's
    *     wall clock IS the UTC instant. A bare cast to LTZ interprets the
    *     wall clock in the SESSION zone (off by the session offset), and
    *     any construction that round-trips through the session zone's
    *     wall clock is ambiguous in a DST fall-back hour — so rebuild the
    *     instant with `make_timestamp(..., 'UTC')`, which interprets the
    *     NTZ fields in UTC directly (UTC has no transitions; exact for
    *     every instant in any session time zone).
    *   - TIMESTAMP_LTZ (timestamp[us] UTC-adjusted): already correct.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // harmless when ts is already micros; required to read TIMESTAMP(NANOS)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", expr(
          """make_timestamp(year(ts), month(ts), dayofmonth(ts),
            |  hour(ts), minute(ts),
            |  cast(date_format(ts, 'ss.SSSSSS') as decimal(16, 6)),
            |  'UTC')""".stripMargin))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical encoding $other " +
          "(expected INT64 nanos, TIMESTAMP_NTZ micros, or TIMESTAMP_LTZ)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Table → loader, for uniform iteration (validate, smoke tools). */
  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _),
    "customer" -> (customer _), "supplier" -> (supplier _),
    "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  /** Load-time schema contract (FIXTURES.md §2): the column/type surface
    * every registered query assumes. Checked up front by [[validate]] so a
    * regenerated fixture fails with ONE named diff instead of dozens of
    * scattered analysis errors mid-run (the round-6 failure mode: a ts
    * re-encode silently broke 17 queries). Timestamp columns accept both
    * LTZ and NTZ (queries cast where instant semantics matter); `events.ts`
    * is checked AFTER loader normalization, so it must be exactly LTZ.
    * Nullability and additive extra columns are not drift.
    */
  private val tsAny: Seq[types.DataType] =
    Seq(types.TimestampType, types.TimestampNTZType)
  private def one(d: types.DataType): Seq[types.DataType] = Seq(d)
  import types.{IntegerType => I, LongType => L, StringType => S, DoubleType => D}
  val contract: Map[String, Seq[(String, Seq[types.DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> one(I), "r_name" -> one(S)),
    "nation" -> Seq("n_nationkey" -> one(I), "n_name" -> one(S),
      "n_regionkey" -> one(I)),
    "customer" -> Seq("c_custkey" -> one(L), "c_name" -> one(S),
      "c_nationkey" -> one(I), "c_acctbal" -> one(D),
      "c_mktsegment" -> one(S)),
    "supplier" -> Seq("s_suppkey" -> one(L), "s_name" -> one(S),
      "s_nationkey" -> one(I), "s_acctbal" -> one(D)),
    "part" -> Seq("p_partkey" -> one(L), "p_name" -> one(S),
      "p_brand" -> one(S), "p_type" -> one(S), "p_size" -> one(I),
      "p_retailprice" -> one(D)),
    "orders" -> Seq("o_orderkey" -> one(L), "o_custkey" -> one(L),
      "o_orderstatus" -> one(S), "o_totalprice" -> one(D),
      "o_orderdate" -> tsAny, "o_orderpriority" -> one(S)),
    "lineitem" -> Seq("l_orderkey" -> one(L), "l_partkey" -> one(L),
      "l_suppkey" -> one(L), "l_linenumber" -> one(I),
      "l_quantity" -> one(D), "l_extendedprice" -> one(D),
      "l_discount" -> one(D), "l_tax" -> one(D),
      "l_returnflag" -> one(S), "l_linestatus" -> one(S),
      "l_shipdate" -> tsAny),
    "events" -> Seq("event_id" -> one(L), "ts" -> one(types.TimestampType),
      "user_id" -> one(L), "event_type" -> one(S), "value" -> one(D),
      "props" -> one(S)),
    "documents" -> Seq("doc_id" -> one(L), "text" -> one(S),
      "lang" -> one(S), "source" -> one(S), "n_chars" -> one(L)),
    "embeddings" -> Seq("vec_id" -> one(L),
      "embedding" -> one(types.ArrayType(types.FloatType)),
      "label" -> one(I)))

  /** Check every fixture table against [[contract]]; throw ONE
    * IllegalStateException naming every (table, column, expected, found)
    * diff, or return silently. Wired as the first step of `Verify.main`
    * and `Bench.main`. */
  def validate(spark: SparkSession, sfDir: String): Unit = {
    // the table list lives in three structures — keep them provably in
    // sync or a table added to names/loaders silently escapes validation
    // (exactly the drift class this method exists to catch)
    require(contract.keySet == loaders.keySet &&
        loaders.keySet == names.toSet,
      s"Tables.names/loaders/contract out of sync: names=${names.sorted}, " +
        s"loaders=${loaders.keySet.toSeq.sorted}, " +
        s"contract=${contract.keySet.toSeq.sorted}")
    val diffs = contract.toSeq.sortBy(_._1).flatMap { case (tbl, cols) =>
      scala.util.Try(loaders(tbl)(spark, sfDir).schema) match {
        case scala.util.Failure(e) =>
          Seq(s"$tbl: unreadable (${e.getMessage})")
        case scala.util.Success(schema) =>
          cols.flatMap { case (name, ok) =>
            val want = ok.map(_.simpleString).mkString("|")
            schema.find(_.name == name) match {
              case None =>
                Some(s"$tbl.$name: missing (expected $want)")
              // simpleString compare: nullability-insensitive by design
              case Some(f) if !ok.exists(
                  _.simpleString == f.dataType.simpleString) =>
                Some(s"$tbl.$name: expected $want, " +
                  s"found ${f.dataType.simpleString}")
              case _ => None
            }
          }
      }
    }
    if (diffs.nonEmpty) throw new IllegalStateException(
      s"fixture schema drift under $sfDir:\n  " + diffs.mkString("\n  "))
  }
}

/** One registered engine query: the Spark plan plus (optionally) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
