package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 COMPACTION — q145's dimension maintained as the
  * change stream arrives (the CDC-ingest production shape): per-user
  * state is exactly the OPEN version (type, valid_from, version_no);
  * an event of a new type closes it — the closed interval is emitted,
  * final, Append-mode — and opens the next version; a same-type event
  * extends the run and emits nothing. This is q148's merge logic run
  * continuously: the stored-artifact seed q148 reads from parquet IS
  * this operator's state, so batch merge and stream compaction cannot
  * disagree about what a version boundary is. Emitted closed intervals
  * equal batch q145's `is_current = false` rows over everything seen,
  * at every batch boundary (spec-pinned); the open versions live in
  * state, one row per active user — bounded by user cardinality, the
  * same posture as sessionization.
  *
  * Ordering: events sort by (event time, event_id) within each batch
  * (batch q145's total order); cross-batch order is the at-least-once
  * file/Kafka source's per-key delivery order, with the watermark
  * bounding how late a change may arrive. */
object Scd2Streams {

  final case class Scd2Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)

  final case class VersionState(event_type: String, valid_from_us: Long,
      version_no: Long)

  final case class ClosedVersion(user_id: Long, version_no: Long,
      event_type: String, valid_from_us: Long, valid_to_us: Long)

  def compact(events: Dataset[Scd2Event],
      watermark: String = "1 hour"): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[VersionState, ClosedVersion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId, rows, state) => advance(userId, rows, state)
      }
  }

  /** Pure state transition, shared by the operator and its tests. */
  private[streaming] def advance(userId: Long, rows: Iterator[Scd2Event],
      state: GroupState[VersionState]): Iterator[ClosedVersion] = {
    val sorted = rows.toSeq
      .sortBy(e => (EventStreams.toMicros(e.ts), e.event_id))
    var cur = state.getOption
    val out = List.newBuilder[ClosedVersion]
    sorted.foreach { e =>
      val t = EventStreams.toMicros(e.ts)
      cur match {
        case Some(s) if s.event_type != e.event_type =>
          out += ClosedVersion(userId, s.version_no, s.event_type,
            s.valid_from_us, t)
          cur = Some(VersionState(e.event_type, t, s.version_no + 1L))
        case Some(_) => // same type: the run extends, nothing closes
        case None =>
          cur = Some(VersionState(e.event_type, t, 1L))
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }
}
