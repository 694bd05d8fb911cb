package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStreams.{toMicros, EventRow}

/** STREAMING ENTRY–EXIT SESSION PANEL — batch q208's matrix fed live
  * (round-12 verdict task 7): per-user open-session state closes
  * sessions as the event stream proves them over (gap exceeded, or the
  * watermark passing the session's horizon), emitting one
  * `(user, entry_type, exit_type, n_events, value_u)` row per CLOSED
  * session; [[entryExitMatrix]] is then q208's exact consumer-side
  * re-aggregate (counts, bounces, micro bounce share) and
  * [[entryValuePanel]] q229's (first-touch value by entry door) over
  * whatever closed so far.
  *
  * Semantics pinned to batch q208's `sessionized` stage at its exact
  * grain: the gap rule compares EPOCH-SECOND-truncated timestamps
  * (`ts.cast(long)`) and breaks strictly past 1800 s; entry/exit are
  * the extremes of the (ts, event_id) total order, so within-batch
  * disorder is fully repaired (the batch sorts before the group
  * iterator runs). Cross-batch the feed is assumed batch-monotone per
  * user (the staging contract every monitor in this package documents);
  * a cross-batch late event that still lands within the open session's
  * gap window — bounded on BOTH sides of the session span ([[withinSpan]]:
  * no earlier than `start − 1800 s`, no later than `end + 1800 s`) —
  * MERGES into it and can re-elect the entry if it precedes the
  * session's current start in the total order, while one older than the
  * span's gap window closes instantly as its own isolated singleton
  * rather than silently disappearing or corrupting the live session
  * (flatMapGroupsWithState does not auto-drop below-watermark rows, so
  * this path is reachable under cross-batch disorder).
  * `SessionStreamsSpec` pins stream ≡ batch bit-equality on the
  * per-session rows AND the matrix, plus the ancient-late-event case.
  *
  * Scale posture: state is ONE bounded record per user with an open
  * session (start/end micros + ids, two type strings, a count) —
  * evicted by event-time timeout as soon as the watermark passes
  * `end + gap`, so state tracks ACTIVE users, not ever-seen users;
  * emission is Append (a closed session is final); the consumer matrix
  * is ≤ |types|² rows. */
object SessionStreams {

  /** Per-user open session: the (ts, event_id)-order extremes, the
    * running event count, and the exact value sum in ten-thousandth
    * units (per-row `rint(value·10⁴)` — the testdata's values carry
    * ≤ 2 decimals, so the long units equal batch q229's
    * DECIMAL(18,4)·10⁴ sum exactly AND order-independently, which a
    * double accumulator could not promise). */
  final case class OpenSession(startUs: Long, startId: Long, entry: String,
      endUs: Long, endId: Long, exit: String, n: Long, valueU: Long)

  /** One closed session — final the moment it is emitted. */
  final case class ClosedSession(user_id: Long, entry_type: String,
      exit_type: String, n_events: Long, value_u: Long)

  /** q208's gap grain: epoch-second truncation (`ts.cast(long)`), break
    * strictly past 1800 s. */
  private def secOf(us: Long): Long = Math.floorDiv(us, 1000000L)

  private[streaming] def sameSession(endUs: Long, tUs: Long): Boolean =
    secOf(tUs) - secOf(endUs) <= 1800L

  /** A cross-batch late event merges only if it lands within the gap
    * window of the open session's SPAN — bounded on BOTH sides. Without
    * the early bound, `sameSession(end, t)` is vacuously true for any
    * t in the past, and an arbitrarily old late event would re-elect
    * the entry and inflate n/value, breaking stream ≡ batch q208/q229. */
  private[streaming] def withinSpan(s: OpenSession, tUs: Long): Boolean =
    sameSession(s.endUs, tUs) && secOf(s.startUs) - secOf(tUs) <= 1800L

  /** Pure per-user transition — shared by the operator and the spec's
    * direct replay. */
  private[streaming] def advance(
      userId: Long,
      rows: Iterator[EventRow],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (rows.isEmpty && state.hasTimedOut) {
      // Watermark passed the open session's horizon: close it, free the
      // user's state slot.
      val out = state.getOption
        .map(s => ClosedSession(userId, s.entry, s.exit, s.n, s.valueU))
        .iterator
      state.remove()
      return out
    }
    // Repair within-batch disorder exactly like the batch window sort.
    val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
    var closed = List.empty[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      val vU = math.rint(e.value * 10000.0).toLong
      open match {
        case Some(s) if withinSpan(s, t) =>
          var s2 = s.copy(n = s.n + 1, valueU = s.valueU + vU)
          if (t < s.startUs || (t == s.startUs && e.event_id < s.startId))
            s2 = s2.copy(startUs = t, startId = e.event_id,
              entry = e.event_type)
          if (t > s.endUs || (t == s.endUs && e.event_id > s.endId))
            s2 = s2.copy(endUs = t, endId = e.event_id,
              exit = e.event_type)
          open = Some(s2)
        case Some(s) if secOf(s.startUs) - secOf(t) > 1800L =>
          // Cross-batch late event OLDER than the open session's gap
          // window: it belongs to a session the watermark already proved
          // over, so it closes instantly as its own isolated singleton;
          // the open session — still live — is untouched.
          closed ::= ClosedSession(userId, e.event_type, e.event_type,
            1L, vU)
        case prev =>
          prev.foreach(s =>
            closed ::= ClosedSession(userId, s.entry, s.exit, s.n, s.valueU))
          open = Some(OpenSession(t, e.event_id, e.event_type,
            t, e.event_id, e.event_type, 1L, vU))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Close once the watermark proves no in-gap event can arrive:
      // the horizon is second-granular like the gap rule itself.
      // Clamped to watermark+1: under cross-batch disorder (staged
      // files arriving out of time order — measured on the 100×
      // staged corpus) a late batch can carry a session whose horizon
      // the watermark has ALREADY passed; Spark rejects a timeout
      // before the watermark, and the clamp makes that session close
      // on the very next batch instead of crashing the query.
      val horizon = (secOf(s.endUs) + 1800L + 1L) * 1000L
      state.setTimeoutTimestamp(
        math.max(horizon, state.getCurrentWatermarkMs() + 1L))
    }
    closed.reverseIterator
  }

  /** The streaming operator: Append mode, event-time timeout. */
  def closedSessions(events: Dataset[EventRow],
      watermark: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, st) => advance(userId, rows, st)
      }
  }

  /** q229's value panel over closed sessions — the identical consumer
    * re-aggregate (entry door, sessions, exact value units, value per
    * session, micro share, q229's order). */
  def entryValuePanel(closed: DataFrame): DataFrame =
    closed.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("value_u")).as("sum_value_u"))
      .withColumn("total_u", sum(col("sum_value_u")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("value_per_session_u", expr("sum_value_u div n_sessions"))
      .withColumn("share_u",
        when(col("total_u") === 0L, lit(0L))
          .otherwise(expr("(1000000 * sum_value_u) div total_u")))
      .select(col("entry_type"), col("n_sessions"), col("sum_value_u"),
        col("value_per_session_u"), col("share_u"))
      .orderBy(col("share_u").desc, col("entry_type"))

  /** q208's matrix over closed sessions — the identical aggregate
    * (entry, exit, count, bounces, micro bounce share, q208's order). */
  def entryExitMatrix(closed: DataFrame): DataFrame =
    closed.groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"))
      .withColumn("bounce_u", expr("(1000000 * n_bounce) div n_sessions"))
      .orderBy(col("n_sessions").desc, col("entry_type"), col("exit_type"))
}
