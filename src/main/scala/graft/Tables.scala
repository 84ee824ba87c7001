package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    *     wall clock in the SESSION zone (off by the session offset), so
    *     first re-render the UTC wall clock into the session zone with
    *     `convert_timezone('UTC', current_timezone(), ts)`; the cast then
    *     lands on the exact instant in any session time zone.
    *   - TIMESTAMP_LTZ (timestamp[us] UTC-adjusted): already correct.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, convert_timezone, expr, lit, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // harmless when ts is already micros; required to read TIMESTAMP(NANOS)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          convert_timezone(lit("UTC"), expr("current_timezone()"), col("ts"))
            .cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical encoding $other " +
          "(expected INT64 nanos, TIMESTAMP_NTZ micros, or TIMESTAMP_LTZ)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
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
