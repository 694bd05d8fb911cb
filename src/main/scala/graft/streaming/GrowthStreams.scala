package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventStreams.{toMicros, EventRow}

/** STREAMING GROWTH-ACCOUNTING MONITOR — batch q202's lifecycle ledger
  * fed live: each user's events classify their NEW active days as
  * new / retained / resurrected the moment the day's first event
  * arrives, instead of at the nightly batch. The consumer's ledger is
  * the bounded per-(day, class) count; churn stays a DERIVED column
  * there (active(d−1) − retained(d), q202's identity) because absence
  * never arrives on a stream — the same structural blind spot
  * [[DeltaStreams]] documents for removed documents.
  *
  * Semantics per user (UTC day = epoch-seconds div 86400, q202's
  * floor): the state is the user's LATEST classified day. A batch's
  * distinct new days classify in order against it (no prior day →
  * `new`; gap 1 → `retained`; gap > 1 → `resurrected`). A second
  * event on the already-classified frontier day folds NOTHING — that
  * is the normal at-least-once/multi-event-per-day case, idempotent
  * by design, not a loss. An event for a day STRICTLY BEFORE the
  * frontier, however, cannot be classified correctly any more (its
  * day's class was derived from a gap that didn't know it) — it is
  * emitted as a `late` marker row, never silently dropped
  * ([[TransitionStreams]]' contract), so the consumer sees exactly
  * how much of the feed violated day order.
  *
  * Scale posture: state is ONE long per user; classification happens
  * executor-side in the group iterator; the consumer's ledger
  * aggregate is ≤ span-days × 4 rows. */
object GrowthStreams {

  /** One classified (user, day) — or a late marker. */
  final case class DayClass(user_id: Long, day: Long, cls: String)

  private def dayOf(e: EventRow): Long = toMicros(e.ts) / 86400000000L

  /** Pure per-user transition — shared by the operator and the spec's
    * direct replay. */
  private[streaming] def advance(
      userId: Long,
      rows: Iterator[EventRow],
      state: GroupState[Long]): Iterator[DayClass] = {
    val days = rows.map(dayOf).toSeq.distinct.sorted
    val out = List.newBuilder[DayClass]
    var last = state.getOption
    days.foreach { d =>
      last match {
        case None =>
          out += DayClass(userId, d, "new"); last = Some(d)
        case Some(l) if d == l => () // frontier day again: idempotent
        case Some(l) if d < l =>
          out += DayClass(userId, d, "late")
        case Some(l) =>
          out += DayClass(userId, d,
            if (d - l == 1L) "retained" else "resurrected")
          last = Some(d)
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }

  /** The streaming operator: users-sized single-long state, Append
    * mode — a classified day is final. */
  def dayClasses(events: Dataset[EventRow]): Dataset[DayClass] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, DayClass](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId, rows, state) => advance(userId, rows, state)
      }
  }
}
