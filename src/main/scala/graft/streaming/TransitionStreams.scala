package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStreams.{toMicros, EventRow}

/** STREAMING TRANSITION-KERNEL MONITOR — batch q191 (and through it
  * the q195 stationary iterate) watched live: consecutive (from → to)
  * event pairs are stitched PER USER across micro-batch boundaries, so
  * the kernel a simulator replays (or an alerting rule watches for a
  * new self-loop signature) updates as the feed arrives instead of
  * waiting for the nightly batch.
  *
  * Ordering contract (stated, not assumed silently): batch q191's
  * pairs exist under the (ts, event_id) TOTAL order, which a stream
  * can only reproduce if each user's events arrive in that order
  * across batches — exactly the guarantee a Kafka feed keyed by
  * user_id provides (per-partition order). Within a micro-batch,
  * arrival order is irrelevant (the group sorts); ACROSS batches, an
  * event at or before the user's stitched frontier cannot be spliced
  * into already-emitted pairs — it is emitted as a LATE MARKER row
  * (`late = true`, its would-be from-type null), never silently
  * dropped: the monitor's consumer sees exactly how much of the feed
  * violated the order contract. The frontier check is also the
  * at-least-once replay guard: a replayed batch re-delivers events ≤
  * the frontier and emits only late markers, folding nothing new —
  * and a FULL replay after a checkpoint restart re-emits pairs the
  * checkpoint already saw at most once (flatMapGroupsWithState's
  * delivery contract), which the kernel consumer deduplicates by
  * (user_id, to_event_id) if it needs exactly-once counts.
  *
  * Scale posture: state is THREE fields per user (the frontier event:
  * ts micros, event id, type) — users-sized, the same state class as
  * the q25 sessionizer; each pair is emitted from the executor-side
  * group iterator, nothing corpus-sized reaches the driver. The
  * aggregation to kernel cells is the consumer's ≤|types|² groupBy
  * (spec-pinned bit-equal to batch q191 on an in-order feed). */
object TransitionStreams {

  /** The stitched frontier: the user's latest seen event. */
  final case class Frontier(ts_us: Long, event_id: Long, event_type: String)

  /** One emitted transition (or a late-arrival marker when `late`). */
  final case class Transition(user_id: Long, from_type: String,
      to_type: String, to_event_id: Long, late: Boolean)

  /** Pure per-user state transition — shared by the streaming operator
    * and the spec's direct unit replay. Sorts the batch's new events
    * into (ts, event_id) order, splices the stored frontier in front,
    * emits consecutive pairs, and advances the frontier. Events at or
    * behind the frontier become late markers. */
  private[streaming] def advance(
      userId: Long,
      rows: Iterator[EventRow],
      state: GroupState[Frontier]): Iterator[Transition] = {
    val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
    val out = List.newBuilder[Transition]
    var front = state.getOption
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      front match {
        case Some(f) if t < f.ts_us ||
            (t == f.ts_us && e.event_id <= f.event_id) =>
          // Behind the stitched frontier: cannot be spliced into pairs
          // that already shipped — surfaced, never silently dropped.
          out += Transition(userId, null, e.event_type, e.event_id,
            late = true)
        case Some(f) =>
          out += Transition(userId, f.event_type, e.event_type, e.event_id,
            late = false)
          front = Some(Frontier(t, e.event_id, e.event_type))
        case None =>
          front = Some(Frontier(t, e.event_id, e.event_type))
      }
    }
    front.foreach(state.update)
    out.result().iterator
  }

  /** The streaming operator: per-user pair stitching with users-sized
    * state. Append mode — an emitted pair is final. */
  def transitions(events: Dataset[EventRow]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Frontier, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId, rows, state) => advance(userId, rows, state)
      }
  }
}
