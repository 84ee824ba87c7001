package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the engine's batch operators
  * (SURVEY.md §2.7): the same event-table semantics as `q12` / `q15`, on
  * an unbounded source with watermarks and managed state.
  *
  * Sources: any streaming DataFrame with the `events` schema — in
  * production `readStream.parquet(dir)` (the FileStreamSource is the
  * streaming twin of the S1/S2 catalog scan: it lists new files per
  * micro-batch with the same prefix pushdown), in tests a MemoryStream.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming file source over a directory of event parquet — new files
    * are discovered and processed incrementally per micro-batch. */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** q12's tumbling window, streaming: 10-minute windows per event type
    * with a 10-minute watermark bounding state. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-stream INTERVAL join — the streaming twin of the batch
    * interval-overlap/as-of family (q18/q26/q30): every left row joined
    * to right rows with the same key whose event time falls in
    * [left.ts, left.ts + upper].
    *
    * Both sides carry an event-time watermark, and the time-range
    * predicate is what makes the state BOUNDED: from `right.ts <=
    * left.ts + upper` Spark derives a state watermark per side, evicts
    * buffered rows older than it, and drops late arrivals — without the
    * range condition a stream-stream join must buffer both streams
    * forever. Late-data eviction is proven in EventStreamSpec (a
    * would-match row arriving behind the watermark joins nothing and
    * state row counts stay flat).
    *
    * The two time columns must have distinct names (both appear in the
    * output); join-key columns are equated by name and deduplicated. */
  def intervalJoin(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      joinKeys: Seq[String],
      watermarkDelay: String = "10 minutes",
      upper: String = "10 minutes"): DataFrame = {
    require(leftTs != rightTs,
      s"intervalJoin: time columns must have distinct names (both got " +
        s"'$leftTs') — rename one side before joining")
    require(joinKeys.nonEmpty,
      "intervalJoin: at least one equality key is required (a pure " +
        "time-range stream-stream join cannot be partitioned)")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val keyCond = joinKeys.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond = r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upper")
    // drop the right side's copy of each equality key from the output
    joinKeys.foldLeft(l.join(r, keyCond && timeCond))((d, k) => d.drop(r(k)))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserSessionState(nEvents: Long, lastUs: Long, sessions: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** q15's sessionization, streaming: per-user session counting with a
    * 30-minute gap, held in managed `GroupState` (the
    * mapGroupsWithState pattern — state lives in the state store,
    * checkpointed, recoverable). */
  def sessionize(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapUs = 1800L * 1000000L
    // exact microseconds (epochSecond*1e6 + nano/1e3) — getTime*1000 would
    // drop sub-millisecond components and could flip a gap-boundary
    // classification relative to the batch twin q15's unix_micros
    def micros(ts: java.sql.Timestamp): Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, UserSessions](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[UserSessionState]) =>
          val prev = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue, 0L))
          // order within the micro-batch (streams deliver unordered)
          val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var (n, last, sessions) = (prev.nEvents, prev.lastUs, prev.sessions)
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (last == Long.MinValue || us - last > gapUs) sessions += 1
            last = us
            n += 1
          }
          state.update(UserSessionState(n, last, sessions))
          UserSessions(userId, n, sessions)
      }
  }

  final case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)
  final case class ClosedSession(user_id: Long, start_us: Long,
      end_us: Long, n_events: Long)

  /** Session windows with CLOSED-session emission and state EVICTION —
    * the production companion to [[sessionize]] (whose `NoTimeout`
    * running counts keep one state row per user forever). Here a
    * session is emitted exactly once, when the event-time watermark
    * passes its gap deadline, and the user's state row is REMOVED
    * (`flatMapGroupsWithState` + `EventTimeTimeout`): state size tracks
    * currently-active users, not ever-seen users — the difference
    * between a bounded state store and an unbounded one on a 100 TB/day
    * event stream. In-batch gap splits emit immediately; the final open
    * session of a batch arms a timeout at (last event + gap) and closes
    * when the watermark crosses it. Late events behind the watermark
    * are dropped by the watermark, never reopening a closed session.
    *
    * Cross-batch out-of-order events (allowed up to `watermarkDelay`
    * late) MERGE into the open session with `startUs = min`, `lastUs =
    * max` — native `session_window` semantics — and the gap split only
    * applies when an event lands beyond the session's current end
    * (`us - lastUs > gap`); an earlier-than-open event can therefore
    * never regress the span or fabricate an `end_us < start_us`
    * session. */
  def sessionizeClosed(events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    def micros(ts: java.sql.Timestamp): Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: close and EVICT
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(userId, s.startUs, s.lastUs, s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ListBuffer[ClosedSession]()
            var open = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts)
              open match {
                case Some(s) if us - s.lastUs > gapUs =>
                  closed += ClosedSession(userId, s.startUs, s.lastUs,
                    s.nEvents)
                  open = Some(OpenSession(us, us, 1L))
                case Some(s) =>
                  // in-window out-of-order arrival: widen, never regress
                  open = Some(OpenSession(math.min(s.startUs, us),
                    math.max(s.lastUs, us), s.nEvents + 1))
                case None =>
                  open = Some(OpenSession(us, us, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout fires once the EVENT-TIME watermark crosses this
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.iterator
          }
      }
  }

  /** The NATIVE `session_window` twin of [[sessionizeClosed]] — the
    * declarative path: Spark's built-in session-window aggregation does
    * the merge/split bookkeeping in the state store itself (sessions
    * merge when an in-watermark event bridges them, exactly the
    * semantics [[sessionizeClosed]] hand-implements), and Append mode
    * emits each session once, when the watermark passes its window end.
    * Prefer this form where a plain per-session aggregate suffices —
    * the custom `flatMapGroupsWithState` twin remains for logic a
    * built-in aggregate can't express (per-event side effects, custom
    * eviction policy).
    *
    * Convention difference, pinned by the differential spec: the
    * built-in's window `end` is last event + gap, so this returns
    * `end_us` = sessionizeClosed's `end_us` + gap on identical input.
    * Returns (user_id, start_us, end_us, n_events). */
  def sessionizeNative(events: Dataset[Event],
      watermarkDelay: String = "10 minutes",
      gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
}
