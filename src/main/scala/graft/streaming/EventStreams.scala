package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming counterparts of the batch [[graft.operators.Events]]
  * queries, over the same `events` schema
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference is pure batch (SURVEY.md §2: no streaming of any form);
  * this is the driver-mandated extension surface expressed the
  * Spark-native way: `readStream` → watermarked event-time windows →
  * `flatMapGroupsWithState` for custom session state.
  *
  * Scale posture: all operators key their state by `user_id` (high
  * cardinality, uniform) so state distributes evenly across executors;
  * watermarks bound state size — nothing grows with total stream length.
  * These transforms are source-agnostic: the same code runs on a Kafka
  * source in production and a MemoryStream in tests.
  */
object EventStreams {

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Accumulating state for one user's open session. Times are
    * microseconds since epoch — `Timestamp.getTime` alone truncates to
    * millis and would drift from the batch q25 results on
    * microsecond-resolution event times. */
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // same 30-min gap as batch q25

  private[streaming] def toMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private[streaming] def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** File-source stream over an events-table directory: the production
    * entry (`readStream` — swap for Kafka by changing only this method).
    * `ts` has shipped as both parquet TIMESTAMP(NANOS) — unreadable
    * without the legacy raw-nanos flag — and TIMESTAMP(MICROS); a
    * one-file batch sniff picks the physical type (streams need an
    * explicit schema anyway), and both encodings normalize to the SAME
    * session-TZ timestamp column exactly as the batch
    * [[graft.Tables.events]] does. */
  def eventSource(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsPhysical = spark.read.parquet(path).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsPhysical),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = spark.readStream.schema(schema).parquet(path)
    tsPhysical match {
      case LongType => // raw nanos (legacy flag)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Streaming twin of q20: hourly tumbling counts per event type.
    * Late events beyond the watermark are dropped; the window closes and
    * emits once the watermark passes its end (Append mode compatible). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming twin of q23: first event per (user, type), exactly-once
    * within the watermark horizon via `dropDuplicatesWithinWatermark`. */
  def firstEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Watermarked stream-stream interval self-join: for every `first`-type
    * event, the `thenType` events by the same user within `[0, withinMin]`
    * minutes after it (funnel/attribution — "click followed by purchase").
    *
    * Both sides carry a watermark and the join condition bounds `b_ts`
    * to a finite interval after `a_ts`, so Spark can expire join state:
    * the left side keeps rows only until `watermark - withinMin`, the
    * right until `watermark` — state is bounded regardless of stream
    * length, keyed by the uniform `user_id`. This is the streaming shape
    * of the batch as-of/range joins (q52/q53). */
  def followWithin(events: DataFrame, first: String, thenType: String,
      withinMin: Int = 10, watermark: String = "2 hours"): DataFrame = {
    val a = events.filter(col("event_type") === first)
      .select(col("event_id").as("a_id"), col("ts").as("a_ts"),
        col("user_id").as("a_user"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === thenType)
      .select(col("event_id").as("b_id"), col("ts").as("b_ts"),
        col("user_id").as("b_user"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMin MINUTES"))
      .select(col("a_user").as("user_id"), col("a_id"), col("a_ts"),
        col("b_id"), col("b_ts"))
  }

  final case class HourCount(event_type: String, hour: Timestamp, n: Long)
  final case class RateBaseline(totalN: Long, nHours: Long)
  final case class RateAnomaly(event_type: String, hour: Timestamp, n: Long,
      baseline_hours: Long, rate_ratio: Double)

  /** Streaming twin of q65: per-type hourly event-rate anomalies.
    *
    * The batch monitor compares each hour to the type's ALL-hours mean —
    * a retrospective baseline a stream cannot know. The streaming-native
    * baseline is the TRAILING mean of every previously finalized hour
    * for that type, so the flag fires the moment the anomalous hour
    * closes (what an on-call alert needs), with a `minBaselineHours`
    * warm-up so the first hours never alert off a 1-2 sample baseline.
    *
    * Shape: two CHAINED stateful operators in Append mode (supported by
    * Spark's multi-stateful-operator watermark propagation) — the
    * windowed count emits each (type, hour) row exactly ONCE, when the
    * watermark passes the hour's end, and `flatMapGroupsWithState`
    * keyed by type folds those finalized rows into a two-long baseline
    * state. State per type is O(1) (total count + hour count), join-free,
    * and the grouping key (event type) is low-cardinality and uniform —
    * bounded regardless of stream length. */
  def rateAnomalies(events: DataFrame, watermark: String = "2 hours",
      threshold: Double = 2.0, minBaselineHours: Int = 3): Dataset[RateAnomaly] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("hour"), col("n"))
      .as[HourCount]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateBaseline, RateAnomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tpe, rows, state) => advanceRate(tpe, rows, state,
          threshold, minBaselineHours)
      }
  }

  /** Pure baseline-state transition, shared by the streaming operator
    * and its unit tests. Rows are finalized hour counts; fold them in
    * event-time order (a watermark jump can finalize several hours in
    * one batch), flagging each against the baseline of strictly PRIOR
    * hours before folding it in. */
  private[streaming] def advanceRate(
      tpe: String,
      rows: Iterator[HourCount],
      state: GroupState[RateBaseline],
      threshold: Double,
      minBaselineHours: Int): Iterator[RateAnomaly] = {
    var b = state.getOption.getOrElse(RateBaseline(0L, 0L))
    val out = List.newBuilder[RateAnomaly]
    rows.toSeq.sortBy(h => toMicros(h.hour)).foreach { h =>
      // Same ratio algebra as batch q65: n / (total/nHours), as one
      // double division of exact int64 counts.
      if (b.nHours >= minBaselineHours) {
        val ratio = h.n.toDouble * b.nHours.toDouble / b.totalN.toDouble
        if (ratio >= threshold)
          out += RateAnomaly(tpe, h.hour, h.n, b.nHours, ratio)
      }
      b = RateBaseline(b.totalN + h.n, b.nHours + 1L)
    }
    state.update(b)
    out.result().iterator
  }

  /** Streaming twin of q25: gap-based sessionization with custom state.
    *
    * State per user = the open session (start, end, count, value sum).
    * A new event within [[SessionGapMs]] of the open session's end extends
    * it; a later event closes and emits the old session. An event-time
    * timeout (watermark passing `end + gap`) closes the final session.
    * Emitted sessions are final — Append output mode.
    */
  def sessionize(events: Dataset[EventRow],
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state) => advanceSessions(userId, rows, state)
      }
  }

  /** Pure session-state transition, shared by the streaming operator and
    * its unit tests. */
  private[streaming] def advanceSessions(
      userId: Long,
      rows: Iterator[EventRow],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (rows.isEmpty && state.hasTimedOut) {
      // Watermark passed the open session's horizon: emit it, clear state.
      val out = state.getOption.map(toSession(userId, _)).iterator
      state.remove()
      return out
    }
    // Events arrive unordered within a micro-batch; order by event time
    // (ties by event_id, matching batch q25's sort).
    val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
    var closed = List.empty[Session]
    var open = state.getOption
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      open match {
        case Some(s) if t - s.end <= SessionGapUs =>
          open = Some(SessionState(s.start, math.max(s.end, t), s.n + 1,
            s.sum + e.value))
        case Some(s) =>
          closed ::= toSession(userId, s)
          open = Some(SessionState(t, t, 1L, e.value))
        case None =>
          open = Some(SessionState(t, t, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Close once the watermark proves no in-gap event can still arrive
      // (timeout API is millisecond-granular; round up).
      state.setTimeoutTimestamp((s.end + SessionGapUs + 999L) / 1000L)
    }
    closed.reverseIterator ++ Iterator.empty
  }

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, fromMicros(s.start), fromMicros(s.end), s.n, s.sum)

  // ---------------------------------------------------------------
  // Trending (streaming twin of batch q93)
  // ---------------------------------------------------------------

  final case class HourTypeCount(hour: Timestamp, event_type: String, n: Long)
  final case class TrendMove(hour: Timestamp, event_type: String,
      n_events: Long, rnk: Long, prev_rnk: Option[Long], moved: Option[Long])
  /** Last-seen rank per event type (micros of the hour it came from are
    * irrelevant — batch q93's `lag` compares against the type's previous
    * APPEARANCE, however far back). */
  final case class TrendState(ranks: Map[String, Long])

  /** Streaming twin of q93: as each hourly window closes, rank event
    * types by volume (`row_number` semantics — name tie-break) and emit
    * each type's movement vs its previous appearance.
    *
    * The ranking is inherently GLOBAL per hour, so the stateful operator
    * runs as a single logical group — fine, because its input is the
    * already-aggregated hour × type frame (tiny at any event volume; the
    * heavy reduction happened in the upstream watermarked groupBy, which
    * distributes normally). The state is one rank per type ever seen.
    * Emissions are final (Append): a window only reaches this operator
    * once the watermark closes it. */
  def trending(events: DataFrame, watermark: String = "2 hours"): Dataset[TrendMove] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"))
      .as[HourTypeCount]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[TrendState, TrendMove](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) => advanceTrend(rows, state)
      }
  }

  /** Pure rank-state transition, shared by the operator and its spec.
    * A watermark jump can close several hours at once; process them in
    * event-time order, and within an hour rank by (n desc, type) —
    * exactly batch q93's `row_number` ordering. */
  private[streaming] def advanceTrend(rows: Iterator[HourTypeCount],
      state: GroupState[TrendState]): Iterator[TrendMove] = {
    var ranks = state.getOption.map(_.ranks).getOrElse(Map.empty[String, Long])
    val out = List.newBuilder[TrendMove]
    rows.toSeq.groupBy(h => toMicros(h.hour)).toSeq.sortBy(_._1)
      .foreach { case (_, hourRows) =>
        val ranked = hourRows.sortBy(h => (-h.n, h.event_type)).zipWithIndex
        val updates = ranked.map { case (h, i) =>
          val rnk = (i + 1).toLong
          val prev = ranks.get(h.event_type)
          out += TrendMove(h.hour, h.event_type, h.n, rnk, prev,
            prev.map(_ - rnk))
          h.event_type -> rnk
        }
        ranks = ranks ++ updates
      }
    state.update(TrendState(ranks))
    out.result().iterator
  }
}
