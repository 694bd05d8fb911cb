package graft.pipeline

import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator

/** The typed inference scaffold: B1 batching + per-partition scorer init
  * + the reference's error policies, as one `mapPartitions` stage.
  *
  * Mirrors the mapper loop of
  * `/root/reference/java/PredictBatchMapperCluster.java:45-84` with the
  * two deliberate fixes SURVEY.md §4 calls out:
  *  - scorer state initializes once per **partition**, not once per
  *    32-row batch (the reference reloads the model every batch);
  *  - dropped rows are counted in accumulators — the drop *semantics*
  *    are preserved (silent in the output), but observable.
  *
  * Iterator discipline: `it.grouped(batchSize)` reproduces B1 including
  * the tail flush (`cleanup`, `PredictBatchMapperCluster.java:71-75`)
  * with no manual buffer, and never materializes a partition.
  */
object Infer {

  val DefaultBatchSize = 32 // `/root/reference/java/PredictBatchMapperCluster.java:19`

  /** Classify with a per-item scorer. A per-item exception is M3's decode
    * failure: the sentinel `(labels(0), 0.0)` is emitted
    * (`/root/reference/python/predict_batch_threaded_local.py:100-108`). */
  def classify(
      items: Dataset[Item],
      scorer: Scorer,
      labels: LabelDict,
      batchSize: Int = DefaultBatchSize,
      sentinels: Option[LongAccumulator] = None): Dataset[Prediction] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      scorer.init()
      it.grouped(batchSize).flatMap { batch =>
        batch.map { item =>
          try {
            val (idx, prob) = scorer.score(item.payload)
            Prediction(item.path, labels(idx), prob)
          } catch {
            case _: Exception =>
              sentinels.foreach(_.add(1))
              Prediction(item.path, labels(0), 0.0)
          }
        }
      }
    }
  }

  /** Classify through a subprocess with X1/X2 fidelity: rows the process
    * fails to echo (malformed lines, crashed batch) are silently absent
    * from the output — the reference's observable contract — but counted. */
  def classifyPiped(
      items: Dataset[Item],
      scorer: PipeScorer,
      labels: LabelDict,
      batchSize: Int = DefaultBatchSize,
      dropped: Option[LongAccumulator] = None): Dataset[Prediction] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      scorer.init()
      it.grouped(batchSize).flatMap { batch =>
        val scored = scorer.scoreKeyed(batch.map(_.payload))
        val out = batch.flatMap { item =>
          scored.get(item.payload).map { case (idx, prob) =>
            Prediction(item.path, labels(idx), prob)
          }
        }
        dropped.foreach(_.add(batch.size - out.size))
        out
      }
    }
  }
}
