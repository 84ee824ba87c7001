package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against every physical encoding the fixture has
  * shipped with: INT64 epoch-nanos (rounds 1-5), naive micros timestamp
  * (TIMESTAMP_NTZ, round 6 regeneration), and UTC-adjusted micros
  * (TIMESTAMP_LTZ). The contract is that `unix_micros(ts)` returns the
  * file's raw integer micros — the same values DuckDB's `epoch_us(ts)`
  * oracle sees — regardless of encoding or session time zone.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // two instants, exact micros: 2024-03-01T12:00:00Z and +90 minutes
  private val us0 = 1709294400000000L
  private val us1 = us0 + 90L * 60 * 1000000

  private def tmp(): String = {
    val d = specTempDir("tables-spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def checkLoaded(dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType,
      "loader must normalize ts to TIMESTAMP_LTZ")
    val got = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === Seq(us0, us1))
  }

  test("events loader: INT64 epoch-nanos encoding (legacy fixture)") {
    val dir = tmp()
    Seq((1L, us0 * 1000L), (2L, us1 * 1000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    checkLoaded(dir)
  }

  test("events loader: naive micros timestamp (TIMESTAMP_NTZ fixture)") {
    val dir = tmp()
    Seq((1L, us0), (2L, us1)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    checkLoaded(dir)
  }

  test("events loader: UTC-adjusted micros timestamp (TIMESTAMP_LTZ)") {
    val dir = tmp()
    Seq((1L, us0), (2L, us1)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    checkLoaded(dir)
  }

  test("events loader: NTZ conversion is session-TZ-independent") {
    val dir = tmp()
    Seq((1L, us0), (2L, us1)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      checkLoaded(dir)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("events loader: NTZ conversion is exact through a DST fall-back " +
    "hour (ambiguous local wall clock must not shift the instant)") {
    // 2024-11-03T06:30:00Z = the SECOND occurrence of 01:30 local in
    // America/New_York (EST, after the 02:00 EDT -> 01:00 EST rewind).
    // Any construction that round-trips through the session zone's wall
    // clock resolves the ambiguous 01:30 to EDT and lands an hour early.
    val ambiguous = 1730615400000000L // 2024-11-03T06:30:00Z
    val dir = tmp()
    Seq((1L, ambiguous)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val got = Tables.events(spark, dir)
        .select(unix_micros(col("ts"))).as[Long].head()
      assert(got === ambiguous,
        s"ambiguous fall-back wall clock shifted the instant by " +
          s"${(got - ambiguous) / 1000000L} s")
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("events loader: live fixture loads with TIMESTAMP_LTZ ts") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }
}
