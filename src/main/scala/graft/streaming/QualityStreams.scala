package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming ingest QUALITY GATE — the admission filter a crawler feeds:
  * each micro-batch of incoming documents is scored against the three
  * q89 gates (length, duplicate-3-gram repetition, unigram-LM surprisal)
  * and emits per-document ADMIT/REJECT decisions with the first failing
  * gate as attribution.
  *
  * The LM is a FROZEN static table ([[TextAnalysis.lmTable]] over the
  * reference corpus), joined into every micro-batch — the CCNet/KenLM
  * side-input shape (ship the model to the scorer, never re-derive it
  * from the stream: a self-trained LM would drift with whatever junk the
  * crawl happens to deliver, letting degenerate batches re-calibrate the
  * gate that should reject them).
  *
  * Stream/batch parity by construction: the scorer is literally
  * [[TextAnalysis.qualityDecisions]], the batch q89 code path, applied
  * per micro-batch via `foreachBatch` (`QualityStreamsSpec` pins
  * decision equality against batch q89 on the same corpus + LM). The
  * repetition and length gates are stateless per-row expressions; the LM
  * join is stream-static; no cross-batch state exists at all, so unlike
  * [[DedupStreams]] there is no index to refresh and replay is naturally
  * idempotent (same batch in ⇒ same decisions out).
  *
  * Scale posture: per micro-batch cost is one scan's worth of per-row
  * expressions plus a term-keyed join against the broadcast-friendly LM
  * (vocabulary-sized; per-lang totals rows broadcast inside the shared
  * scorer). Source is swappable (Kafka in production, file source /
  * MemoryStream in tests) — the gate touches only the micro-batch frame.
  */
object QualityStreams {

  /** Run the quality gate over a streaming `documents` frame.
    *
    * @param docs       streaming DataFrame with the documents schema
    *                   ([[DedupStreams.DocumentsSchema]])
    * @param lm         STATIC frozen LM table `(lang, w, cnt, total_l)`
    * @param onBatch    receives the scored decision frame + batchId per
    *                   micro-batch (log it, route admits downstream)
    * @param checkpoint optional checkpoint dir for restartable offsets
    */
  def qualityGate(docs: DataFrame, lm: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(TextAnalysis.qualityDecisions(batch, lm), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** The GOPHER-RULES gate (streaming twin of batch q115): the
    * published floor rules scored per micro-batch. Unlike the LM gate
    * above there is NO artifact to ship — the rules are constants —
    * which is why a crawl pipeline runs this gate FIRST, before the
    * LM-backed gate spends a vocabulary join on documents the floor
    * rules would discard. The scorer is literally
    * [[TextAnalysis.gopherRulesOver]], the batch q115 code path
    * (`QualityStreamsSpec` pins stream==batch flag equality), stateless
    * per document ⇒ replay-idempotent; per-batch cost is per-row
    * expressions plus one (doc, token) partial aggregate for the
    * repetition rule.
    *
    * @param docs streaming DataFrame carrying doc_id + text + n_chars */
  def gopherGate(docs: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(TextAnalysis.gopherRulesOver(batch), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** Streaming COMPRESSION gate — the literal batch
    * [[TextAnalysis.compressionGate]] per micro-batch: artifact-free
    * and stateless like [[gopherGate]] (the scorer is a pure per-row
    * codec run), so stream == batch by construction and replay is
    * naturally idempotent. */
  def compressionGate(docs: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(TextAnalysis.compressionGate(batch).toDF(), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
