package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.{CentroidModel, Media}

/** STREAMING CENTROID TRAINING — the ingest-time twin of
  * [[graft.pipeline.CentroidModel.train]]: labeled feature rows arrive
  * continuously (a labeling crew, a trusted-feed crawl), and after
  * every micro-batch the CURRENT trained model is available — without
  * re-scanning anything, because nearest-centroid training is an exact
  * int64 commutative monoid (per class: row count + per-dim quantized
  * sums). Each batch contributes ONE partial-aggregable
  * `groupBy(label).agg(count, dim × sum)` (≤ classes rows to the
  * driver — [[graft.pipeline.CentroidModel.classSums]], the literal
  * batch-training aggregation, so stream and batch cannot drift); the
  * fold into state is int64 addition; the emitted model is therefore
  * BIT-IDENTICAL to `CentroidModel.train` over everything seen, at
  * every batch boundary, under any batch partitioning — the spec pins
  * byte-equal checkpoints.
  *
  * Model-emission contract: a model is handed to `onModel` only when
  * the classes seen so far are contiguous from 0 — exactly the
  * condition under which batch training would succeed (a gap means a
  * class that could never be predicted; batch `train` rejects it
  * loudly, the stream simply isn't servable yet and waits).
  *
  * At-least-once safety: a REPLAYED batch id folds nothing (the
  * monitor keeps the last folded id — sums are not idempotent, so
  * replay protection is correctness here, not hygiene; the
  * `DedupStreams` batchId-marker discipline, held in memory because
  * this monitor's state is driver-side).
  *
  * Scale posture: per batch one aggregation whose shuffle payload is
  * `classes × 17` longs after map-side combine; driver state is
  * `classes × 17` longs FOREVER, independent of rows seen. The feature
  * rows themselves never accumulate anywhere. */
object TrainStreams {

  /** The driver-side fold, separated from the query wiring so the
    * replay guard is directly testable: `fold` returns the current
    * model when the cumulative class set is contiguous from 0, `None`
    * otherwise; a batch id ≤ the last folded id is a strict no-op. */
  private[graft] final class TrainFold(dim: Int) {
    private val state = mutable.Map.empty[Int, (Long, Array[Long])]
    private var lastFolded = -1L

    def fold(batch: DataFrame, batchId: Long): Option[CentroidModel] = {
      if (batchId > lastFolded) {
        lastFolded = batchId
        CentroidModel.classSums(batch, dim).foreach {
          case (idx, (n, sums)) =>
            state.get(idx) match {
              case Some((pn, psums)) =>
                var i = 0
                while (i < psums.length) {
                  psums(i) += sums(i)
                  i += 1
                }
                state(idx) = (pn + n, psums)
              case None => state(idx) = (n, sums)
            }
        }
      }
      if (state.nonEmpty && (0 to state.keys.max).forall(state.contains))
        Some(CentroidModel.fromSums(state.toMap))
      else None
    }
  }

  /** Start the trainer over a streaming `(label_idx, features)` frame.
    * `onModel(model, batchId)` fires after each batch whose cumulative
    * class set is contiguous from 0 (see the emission contract).
    *
    * Restart posture — deliberately NO checkpointLocation option here:
    * the fold's state lives driver-side, so resuming a checkpointed
    * source after a restart would skip the already-committed prefix
    * while the fresh fold starts empty — silently violating the
    * bit-equality contract. A restarted trainer must re-feed from the
    * beginning (the fold is cheap: one aggregate per batch), or better,
    * persist the model artifact per batch (`CentroidSums.save`) and
    * resume by `--update`-folding only genuinely new batches into it —
    * the exact-merge path `graft.Train --update` ships. */
  def monitor(labeled: DataFrame,
      onModel: (CentroidModel, Long) => Unit,
      dim: Int = Media.FeatureDim): StreamingQuery = {
    val state = new TrainFold(dim)
    labeled.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        state.fold(batch, batchId).foreach(onModel(_, batchId))
      }
      .start()
  }
}
