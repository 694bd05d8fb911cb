package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming RAG CHUNKER — the ingestion shape of a live retrieval
  * index: each micro-batch of incoming documents is split into q104's
  * overlapping token windows and emitted as the chunk table the
  * embedding/indexing stage consumes row by row (doc_id, chunk_id,
  * span, content md5 — the hash doubling as the chunk-level dedup key,
  * so an index can skip re-embedding boilerplate chunks it has seen).
  *
  * Stream/batch parity by construction: the chunker is literally
  * [[TextAnalysis.chunksOf]], the batch q104 code path, applied per
  * micro-batch via `foreachBatch` (`ChunkStreamsSpec` pins chunk-set
  * equality against batch q104 on the same corpus). Chunking is
  * stateless per document — no cross-batch state, so batch boundaries
  * cannot change any chunk and replay is naturally idempotent.
  *
  * Scale posture: per micro-batch cost is one scan's worth of per-row
  * `sequence`/`explode` (fan-out n_tokens/stride, doc-length-bounded,
  * uniform — no skew) with NO shuffle at all; the downstream index
  * write is the only exchange, keyed however the index partitions. */
object ChunkStreams {

  /** Run the chunker over a streaming `documents` frame.
    *
    * @param docs       streaming DataFrame with the documents schema
    * @param onBatch    receives the chunk frame + batchId per
    *                   micro-batch (route to the embed/index stage)
    * @param checkpoint optional checkpoint dir for restartable offsets
    */
  def chunker(docs: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(TextAnalysis.chunksOf(batch), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
