package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming WEIGHTED RESERVOIR — q143's Efraimidis–Spirakis draw as a
  * continuous fold: because the E-S key is a pure function of
  * (content-id hash, weight), "sample k of everything seen so far,
  * proportional to weight, without replacement" reduces to "keep the k
  * largest keys seen so far" — the property that makes A-ES the
  * streaming/distributed weighted sampler. Each micro-batch computes
  * keys through the literal batch expression
  * ([[TextAnalysis.sampleKey]]), prunes to its own top-k
  * DISTRIBUTEDLY (per-partition heaps — at most k rows reach the
  * driver per batch), and merges into the k-row reservoir state. After
  * any prefix of batches the reservoir equals the batch q143 draw over
  * that prefix, row for row (spec-pinned) — the deterministic key
  * makes the sample replay-idempotent: a re-delivered batch re-offers
  * identical keys and the merge is a no-op.
  *
  * State: exactly k rows, bounded by construction — no sketch, no
  * growth, nothing corpus-sized anywhere. */
object SampleStreams {

  type Draw = (Long, String, Long, Double) // doc_id, source, n_tokens, skey

  /** The k-row reservoir. Thread-confined to the micro-batch thread. */
  final class Reservoir(val k: Int) {
    private var cur: Vector[Draw] = Vector.empty
    def rows: Vector[Draw] = cur
    private[streaming] def fold(batch: Seq[Draw]): Vector[Draw] = {
      cur = (cur ++ batch).groupBy(_._1).map(_._2.head).toVector
        .sortBy { case (id, _, _, key) => (-key, id) }
        .take(k)
      cur
    }
  }

  /** Start the reservoir over a streaming `(doc_id, text, source, …)`
    * frame. Per batch, `onBatch` receives the updated k-row reservoir
    * (largest-key first, doc_id tie-break — q143's order). */
  def reservoir(docs: DataFrame, state: Reservoir,
      onBatch: (Vector[Draw], Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val topk = batch
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            TextAnalysis.sampleKey.as("skey"))
          .orderBy(col("skey").desc, col("doc_id"))
          .limit(state.k)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getDouble(3)))
        onBatch(state.fold(topk.toSeq), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
