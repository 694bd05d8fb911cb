package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Events

/** STREAMING event debounce — the stateful KEEP-CHAIN twin of batch
  * q155. The batch audit reads the gap to the PREVIOUS event (window-
  * expressible, replayable, the report shape); an ingest gate has to
  * make the stronger keep-or-drop decision, and the correct rule there
  * is the gap to the last KEPT event: a steady drizzle of redeliveries
  * 200 s apart must not extend the suppression window forever (under
  * the lag rule every event after the first would be a "dup" and the
  * stream would emit nothing again — the classic debounce-vs-throttle
  * distinction, spec-pinned on exactly that divergence case).
  *
  * State per (user, type) stream is ONE int64 — the last kept event's
  * timestamp — forever; each micro-batch folds its events in event-time
  * order and emits every event's verdict (Append mode: verdicts are
  * final at emission). In-order delivery per (user, type) stream is
  * assumed across batches (the per-key ordering an event bus
  * guarantees); within a batch the fold sorts by (ts, event_id), so
  * intra-batch arrival order never matters.
  *
  * Scale posture: rows shuffle once, keyed by (user, type), into the
  * stateful operator; state is 8 bytes per active stream; emissions
  * are input-sized. The same `DebounceGapS` constant as q155 — one
  * definition, batch report and streaming gate cannot drift. */
object DebounceStreams {

  final case class KeptState(lastKeptUs: Long)

  final case class Verdict(user_id: Long, event_type: String,
      event_id: Long, ts_us: Long, kept: Boolean)

  /** Run the keep-chain gate over a streaming events frame (the events
    * table shape: user_id, event_id, ts, event_type). Use with
    * `outputMode("append")`. */
  def debounce(events: DataFrame,
      gapS: Long = Events.DebounceGapS): Dataset[Verdict] = {
    import events.sparkSession.implicits._
    val gapUs = gapS * 1000000L
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[KeptState, Verdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((user, typ), rows, state) =>
          var last = state.getOption.map(_.lastKeptUs)
          val out = rows.toSeq.sortBy(r => (r._4, r._3)).map {
            case (_, _, id, tsUs) =>
              val keep = last.forall(l => tsUs - l > gapUs)
              if (keep) last = Some(tsUs)
              Verdict(user, typ, id, tsUs, keep)
          }
          last.foreach(l => state.update(KeptState(l)))
          out.iterator
      }
  }
}
