package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING CUSUM change-point monitor — batch q184 watched live: as
  * FINALIZED hourly counts arrive (the watermark-closed windowed
  * aggregate an event pipeline already emits), each type's drift-free
  * walk advances and the one-sided CUSUM statistics accumulate. The
  * sequential detector is the one that belongs on a stream — CUSUM's
  * whole design (Page 1954) is "smallest expected detection delay for
  * a sustained shift, online"; the batch query is its retrospective
  * audit.
  *
  * Frozen-reference posture: the per-type expected rate ships as the
  * blessed window's (H, T_type) pair — the SAME scaled-deviation
  * arithmetic as batch q184 (d = cnt·H − T, no division, exact int64),
  * with the reference computed batch-side. A stream-updated rate would
  * absorb exactly the shift being watched. Feeding the corpus' own
  * (H, T) makes the final boundary bit-equal to batch q184 per type
  * (spec-pinned).
  *
  * Hour-order contract: rows fold in ascending hour order WITHIN each
  * batch, and batches are assumed hour-ordered across the stream (the
  * upstream watermark closes windows in order). Every reference type
  * is advanced for every arriving hour — a type silent in some hour
  * contributes cnt = 0, exactly the batch grid's densification, so a
  * type going quiet drives its DOWN detector just like in batch. An
  * ALL-silent hour (total feed outage) is densified too: the fold
  * tracks the last folded hour and, when the feed resumes, folds every
  * skipped hour as cnt = 0 for every type — mirroring batch q184's
  * dense span grid. The one residual blind spot, stated plainly: being
  * event-time driven, the walk cannot advance DURING an outage (no
  * row, no micro-batch content) — detection of a dead feed lands at
  * resume time, or needs a wall-clock prober upstream.
  * Unknown types (absent from the reference) are counted into
  * `n_unknown`, never silently dropped (the [[ModelDriftStreams]]
  * posture).
  *
  * State is O(1) per reference type forever: the walk value, its
  * running min/max, the two one-sided maxima, and the two change-point
  * hour estimates — seven longs; no per-hour history is retained
  * (CUSUM's defining property). The [[TrainStreams]] foreachBatch fold
  * discipline: ≤ |hours-in-batch| × |types| tiny rows reach the
  * driver, a replayed batch id folds nothing, and there is
  * deliberately no checkpointLocation (the fold's state lives
  * driver-side; a restarted monitor re-feeds or re-seeds). */
object CusumStreams {

  /** The frozen reference: the blessed window's hour count and
    * per-type totals — |types|+1 longs, ships in the closure. */
  final case class CusumRef(nHours: Long, totals: Map[String, Long]) {
    require(nHours > 0 && totals.nonEmpty,
      "CusumRef: a reference window needs hours and at least one type")
  }

  /** Running per-type detector state after a batch (micro-units are
    * event·hours, batch q184's exact scale). */
  final case class CusumSnapshot(event_type: String, n_hours: Long,
      up_u: Long, up_from_hour: Long, down_u: Long, down_from_hour: Long)

  private final class TypeState {
    var s = 0L
    var smin = Long.MaxValue; var sminHour = 0L
    var smax = Long.MinValue; var smaxHour = 0L
    var up = 0L; var down = 0L
    var hours = 0L
  }

  /** The driver-side fold: one micro-batch of (hour_micros, type, cnt)
    * rows, folded in hour order through the exact batch arithmetic.
    * Separated from the query wiring so the replay guard, the
    * densification, and the unknown-type accounting are directly
    * testable. */
  private val HourMicros = 3600000000L

  private[graft] final class CusumFold(ref: CusumRef) {
    private val st = ref.totals.keys.map(_ -> new TypeState).toMap
    private var unknown = 0L
    private var lastFolded = -1L
    private var lastHour = Long.MinValue

    private def foldHour(h: Long, cnts: Map[String, Long]): Unit =
      ref.totals.foreach { case (t, total) =>
        val d = cnts.getOrElse(t, 0L) * ref.nHours - total
        val s0 = st(t)
        s0.s += d
        s0.hours += 1
        // inclusive compares = ties to the LATEST hour (q184's
        // rule: the change-point estimate is the last extremum
        // touch, so an on-rate prefix dates the onset at its end)
        if (s0.s <= s0.smin) { s0.smin = s0.s; s0.sminHour = h }
        if (s0.s >= s0.smax) { s0.smax = s0.s; s0.smaxHour = h }
        if (s0.s - s0.smin > s0.up) s0.up = s0.s - s0.smin
        if (s0.smax - s0.s > s0.down) s0.down = s0.smax - s0.s
      }

    def fold(rows: Seq[(Long, String, Long)],
        batchId: Long): (Seq[CusumSnapshot], Long) = {
      if (batchId > lastFolded) {
        lastFolded = batchId
        val known = rows.filter { case (_, t, _) =>
          val ok = ref.totals.contains(t)
          if (!ok) unknown += 1
          ok
        }
        val byHour = known.groupBy(_._1)
        byHour.keys.toSeq.sorted.foreach { h =>
          // densify the gap: hours with NO rows at all (total outage)
          // fold cnt = 0 for every type, exactly batch q184's dense
          // span grid (round-11 advice — a dead feed must drive the
          // DOWN detectors once the feed resumes)
          if (lastHour != Long.MinValue) {
            var g = lastHour + HourMicros
            while (g < h) { foldHour(g, Map.empty); g += HourMicros }
          }
          foldHour(h, byHour(h).map(r => r._2 -> r._3).toMap)
          lastHour = h
        }
      }
      (ref.totals.keys.toSeq.sorted.map { t =>
        val s0 = st(t)
        CusumSnapshot(t, s0.hours, s0.up, s0.sminHour, s0.down, s0.smaxHour)
      }, unknown)
    }
  }

  /** Start the monitor over a streaming finalized-hourly-counts frame
    * (needs `hour_micros` long, `event_type` string, `cnt` long).
    * `onSnapshot(snapshots, n_unknown, batchId)` fires after every
    * micro-batch. */
  def monitor(counts: DataFrame, ref: CusumRef,
      onSnapshot: (Seq[CusumSnapshot], Long, Long) => Unit): StreamingQuery = {
    val fold = new CusumFold(ref)
    counts.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val rows = batch
          .select("hour_micros", "event_type", "cnt")
          .as[(Long, String, Long)].collect().toSeq
        val (snaps, unk) = fold.fold(rows, batchId)
        onSnapshot(snaps, unk, batchId)
      }
      .start()
  }
}
