package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming DSIR SELECTION GATE — targeted data selection at ingest:
  * each micro-batch of incoming documents is scored against the frozen
  * hashed-bigram log-ratio table ([[TextAnalysis.dsirLrTable]], the
  * trained DSIR artifact) and emits per-document selected/rejected
  * decisions with the importance weight attached.
  *
  * The log-ratio table is a FROZEN static side input, never re-derived
  * from the stream — the same ship-the-model posture as
  * [[QualityStreams]]' LM: a stream-trained target model would drift
  * toward whatever the crawl delivers, letting an off-target flood
  * re-calibrate the very gate that should reject it (DSIR trains its
  * importance estimator once on the target + a raw sample, then scores
  * everything with that fixed artifact).
  *
  * Stream/batch parity by construction: the scorer is literally
  * [[TextAnalysis.dsirScores]], the batch q107 code path, applied per
  * micro-batch via `foreachBatch` (`DsirStreamsSpec` pins decision AND
  * weight equality against batch q107 on the same corpus + lr table).
  * Scoring is stateless per document given the table — no cross-batch
  * state, so batch boundaries cannot change decisions and replay is
  * naturally idempotent.
  *
  * Scale posture: per micro-batch cost is one explode over the batch's
  * bigrams, one broadcast join against the 256-row lr table, and one
  * doc_id-keyed aggregate — embarrassingly parallel, no stream-side
  * shuffle beyond the per-doc sum. Source is swappable (Kafka in
  * production, MemoryStream in tests).
  */
object DsirStreams {

  /** Run the DSIR selection gate over a streaming `documents` frame.
    *
    * @param docs       streaming DataFrame with the documents schema
    * @param lr         STATIC frozen log-ratio table `(f, lr_u)`
    * @param onBatch    receives the scored decision frame + batchId per
    *                   micro-batch (route selections downstream)
    * @param checkpoint optional checkpoint dir for restartable offsets
    */
  def selectionGate(docs: DataFrame, lr: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(TextAnalysis.dsirScores(batch, lr), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
