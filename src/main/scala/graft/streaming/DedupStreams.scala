package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.operators.Dedup

/** Streaming incremental deduplication — the production ingest loop for
  * a curation pipeline, end-to-end: a file-source stream of newly-crawled
  * documents is deduplicated per micro-batch against a STATIC corpus
  * fingerprint/signature index via `foreachBatch`, using exactly the
  * batch q69 cascade ([[Dedup.incrementalDecisions]]): exact content
  * fingerprint → MinHash band near-dup → unique.
  *
  * Why `foreachBatch` rather than a continuous stateful operator: the
  * per-document decision needs two multi-stage join cascades against
  * corpus-sized static tables — relational work Catalyst already plans
  * optimally per batch — and no cross-batch streaming state (each new doc
  * is judged against the CORPUS, not against other in-flight docs;
  * admitted docs join the corpus index at the next index refresh, exactly
  * like the batch ingest flow). Per batch, cost scales with the batch:
  * both cascade joins are new×corpus equi-joins on fingerprint/band keys,
  * and the corpus side is the precomputed index a production deployment
  * keeps materialized.
  *
  * Scale posture: the corpus index frames should be persisted/bucketed by
  * their join keys (`fp`, band `bh`); each micro-batch then shuffles only
  * the batch's own fingerprints and band rows. The stream source is
  * swappable (Kafka in production, file source here) — the dedup logic
  * touches only the micro-batch DataFrame.
  */
object DedupStreams {

  /** The `documents` table schema, for the file-source stream (a
    * streaming read needs an explicit schema). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a documents-table directory: the production
    * entry (`readStream` — swap for Kafka by changing only this method). */
  def documentSource(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(DocumentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Static corpus indexes for the ingest loop: the content-fingerprint
    * table and the MinHash signature table a production deployment keeps
    * materialized alongside the corpus. */
  final case class CorpusIndex(fp: DataFrame, sig: DataFrame)

  /** Build the corpus index from a static `(doc_id, text)` frame. */
  def corpusIndex(corpus: DataFrame): CorpusIndex =
    CorpusIndex(Dedup.contentFpOf(corpus), Dedup.minhashSigOf(corpus))

  /** The streaming ingest loop: per micro-batch of new documents, run the
    * q69 cascade against the static corpus index and hand the decision
    * frame `(doc_id, status, match_doc)` to `onBatch` (write to the
    * decision log / route admits onward in production; collect in specs).
    * Caller starts the returned writer. */
  def incrementalDedup(newDocs: DataFrame, index: CorpusIndex)(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val decisions = Dedup.incrementalDecisions(
        newFp = Dedup.contentFpOf(batch),
        newSig = Dedup.minhashSigOf(batch),
        corpusFp = index.fp,
        corpusSig = index.sig)
      onBatch(decisions, batchId)
    }
}
