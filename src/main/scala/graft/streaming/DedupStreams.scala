package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.operators.Dedup

/** Streaming incremental deduplication — the production ingest loop for
  * a curation pipeline, end-to-end: a file-source stream of newly-crawled
  * documents is deduplicated per micro-batch against a corpus
  * fingerprint/signature index via `foreachBatch`, using exactly the
  * batch q69 cascade ([[Dedup.incrementalDecisions]]): exact content
  * fingerprint → MinHash band near-dup → unique.
  *
  * Why `foreachBatch` rather than a continuous stateful operator: the
  * per-document decision needs two multi-stage join cascades against
  * corpus-sized static tables — relational work Catalyst already plans
  * optimally per batch — and no cross-batch streaming state beyond the
  * corpus index itself (each new doc is judged against the CORPUS, not
  * against other in-flight docs). Per batch, cost scales with the batch:
  * both cascade joins are new×corpus equi-joins on fingerprint/band keys,
  * and the corpus side is the precomputed index a production deployment
  * keeps materialized.
  *
  * Recovery: pass `checkpointLocation` and the file-source offsets are
  * journaled — a killed stream restarted on the same checkpoint resumes
  * at the first unprocessed file, so every document is decided exactly
  * once across restarts (proven in `DedupStreamsSpec`). The decision log
  * written by `onBatch` is the durable output; a production restart
  * rebuilds the refreshing index from corpus + decision log.
  *
  * Index refresh: with a [[RefreshingIndex]], documents ADMITTED in batch
  * N join the corpus index before batch N+1 runs, so a duplicate arriving
  * k batches after its original is caught ([[RefreshingIndex.admit]]) —
  * the "admitted docs join the corpus at the next index refresh" flow, as
  * code. The refreshed frames are persisted and the superseded ones
  * unpersisted per refresh; at warehouse scale the same move is appending
  * the admitted rows to the materialized index table on a cadence.
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

  /** Corpus indexes for the ingest loop: the content-fingerprint table
    * and the MinHash signature table a production deployment keeps
    * materialized alongside the corpus. */
  final case class CorpusIndex(fp: DataFrame, sig: DataFrame)

  /** Build the corpus index from a static `(doc_id, text)` frame. */
  def corpusIndex(corpus: DataFrame): CorpusIndex =
    CorpusIndex(Dedup.contentFpOf(corpus), Dedup.minhashSigOf(corpus))

  /** A corpus index that grows as the stream admits documents: after each
    * micro-batch, the admitted (unique) docs' fingerprint and signature
    * rows are unioned in, persisted, and materialized, so batch N+1 judges
    * against them. Thread-safe (micro-batches run serially, but `current`
    * may be read concurrently by monitoring).
    *
    * Lineage/cache lifecycle: each refresh persists the new frames,
    * materializes them (so the next batch reads cached blocks, not a
    * growing union chain), then unpersists the frames the PREVIOUS
    * refresh owned. The initial index frames are never unpersisted here —
    * their lifecycle belongs to whoever built them. A long-running
    * deployment compacts to a stored table on a cadence instead of
    * chaining persists forever; at spec/micro-batch scale the chain is
    * bounded by the run.
    */
  final class RefreshingIndex(initial: CorpusIndex) {
    @volatile private var cur: CorpusIndex = initial
    private var owned: List[DataFrame] = Nil

    def current: CorpusIndex = cur

    /** Union the admitted docs' index rows into the corpus index. */
    private[streaming] def admit(admittedFp: DataFrame,
        admittedSig: DataFrame): Unit = synchronized {
      val nfp = cur.fp.union(admittedFp).persist()
      val nsig = cur.sig.union(admittedSig).persist()
      // Materialize eagerly: the next micro-batch must read cached blocks,
      // not re-derive the whole admit chain per batch.
      nfp.count(); nsig.count()
      val old = owned
      owned = List(nfp, nsig)
      cur = CorpusIndex(nfp, nsig)
      old.foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Exception => () })
    }

    /** Drop the frames this refresher persisted (end-of-stream cleanup). */
    def close(): Unit = synchronized {
      owned.foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Exception => () })
      owned = Nil
      cur = initial
    }
  }

  /** The streaming ingest loop: per micro-batch of new documents, run the
    * q69 cascade against the corpus index and hand the decision frame
    * `(doc_id, status, match_doc)` to `onBatch` (write to the decision
    * log / route admits onward in production; collect in specs). Caller
    * starts the returned writer.
    *
    *  - `checkpointLocation`: journal source offsets there so a restart
    *    resumes exactly after the last committed micro-batch;
    *  - `refresher`: judge each batch against the REFRESHING index and
    *    feed admitted docs back into it ([[RefreshingIndex]]); omit for a
    *    fixed corpus (the batch-q69-equivalence configuration). */
  def incrementalDedup(newDocs: DataFrame, index: CorpusIndex,
      checkpointLocation: Option[String] = None,
      refresher: Option[RefreshingIndex] = None)(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val writer = newDocs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val idx = refresher.map(_.current).getOrElse(index)
        // The batch's derived rows feed the cascade AND (under refresh)
        // the index update — persist so the cascade runs once each.
        val batchFp = Dedup.contentFpOf(batch).persist()
        val batchSig = Dedup.minhashSigOf(batch).persist()
        val decisions = Dedup.incrementalDecisions(
          newFp = batchFp, newSig = batchSig,
          corpusFp = idx.fp, corpusSig = idx.sig).persist()
        try {
          onBatch(decisions, batchId)
          refresher.foreach { r =>
            val admitted = decisions
              .filter(col("status") === "unique").select(col("doc_id"))
            r.admit(batchFp.join(admitted, "doc_id"),
              batchSig.join(admitted, "doc_id"))
          }
        } finally {
          decisions.unpersist(blocking = false)
          batchFp.unpersist(blocking = false)
          batchSig.unpersist(blocking = false)
        }
    }
    checkpointLocation.fold(writer)(loc =>
      writer.option("checkpointLocation", loc))
  }
}
