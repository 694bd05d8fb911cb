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
  * at the first uncommitted micro-batch. The raw guarantee is
  * AT-LEAST-ONCE, Spark's `foreachBatch` contract: a crash after
  * `onBatch` ran but before the offset commit replays that batch (same
  * batchId) on restart, so a non-idempotent `onBatch` would double-log
  * its decisions. Passing `onceMarkers` (a durable directory) NARROWS
  * the duplicate window: each batch writes a `<batchId>.done` marker
  * only after `onBatch` + index admit both complete, and a replayed
  * batch that finds its marker skips both (`DedupStreamsSpec` proves
  * the skip). What remains is the unavoidable marker-side window — a
  * crash BETWEEN `onBatch` and the marker write replays `onBatch`'s
  * effects once more. Closing that last window requires the SINK
  * itself to be batchId-transactional — and [[DecisionLog]] SHIPS that
  * sink (overwrite-by-batchId parquet partitions): with it as
  * `onBatch` the loop is exactly-once end-to-end, the crash-window
  * replay overwriting its own partition instead of doubling it
  * (`DedupStreamsSpec` kills the marker write and proves the
  * converged count). Restart
  * contract with a [[RefreshingIndex]]: rebuild it from corpus +
  * decision log before restarting — the log contains every
  * marker-committed batch, so index and log agree.
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

  /** File-source stream over a documents-table directory. The Kafka
    * swap is [[StreamSources.documentsFromKafkaWire]] — same output
    * schema, so every gate downstream runs unchanged
    * (`KafkaSeamSpec` proves it). */
  def documentSource(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    StreamSources.fileSource(spark, path, DocumentsSchema,
      maxFilesPerTrigger)

  /** Corpus indexes for the ingest loop: the content-fingerprint table
    * and the MinHash signature table a production deployment keeps
    * materialized alongside the corpus — plus (optionally) the Bloom
    * membership sketches ([[Dedup.CorpusBlooms]]) that prune a batch's
    * definite-miss rows before either corpus join shuffles. */
  final case class CorpusIndex(fp: DataFrame, sig: DataFrame,
      blooms: Option[Dedup.CorpusBlooms] = None)

  /** Build the corpus index from a static `(doc_id, text)` frame.
    * `withBlooms` additionally sketches it for pre-join pruning (the
    * q72 path; at-scale default — here opt-in because sketch build cost
    * only pays off when the corpus join is expensive). */
  def corpusIndex(corpus: DataFrame, withBlooms: Boolean = false,
      bloomExpectedItems: Long = 100000L, bloomFpp: Double = 0.01): CorpusIndex = {
    val fp = Dedup.contentFpOf(corpus)
    val sig = Dedup.minhashSigOf(corpus)
    CorpusIndex(fp, sig,
      if (withBlooms)
        Some(Dedup.corpusBlooms(fp, sig, bloomExpectedItems, bloomFpp))
      else None)
  }

  /** A corpus index that grows as the stream admits documents: after each
    * micro-batch, the admitted (unique) docs' fingerprint and signature
    * rows are unioned in, persisted, and materialized, so batch N+1 judges
    * against them. Thread-safe (micro-batches run serially, but `current`
    * may be read concurrently by monitoring).
    *
    * Lineage/cache lifecycle: each refresh materializes the new frames
    * with an eager `localCheckpoint` — EVERY generation is
    * self-contained, with no logical lineage back through prior admits
    * or the initial index's build. That invariant is what makes freeing
    * the superseded generation safe: a generation that merely
    * `persist()`ed its union would, on losing a cached block, try to
    * recompute THROUGH the freed (non-recomputable) predecessor and
    * fail. (The warehouse-scale version of the same move is appending
    * admitted rows to the stored index table per refresh.) The initial
    * index frames are never freed here — their lifecycle belongs to
    * whoever built them.
    */
  final class RefreshingIndex(initial: CorpusIndex) {
    @volatile private var cur: CorpusIndex = initial
    private var owned: List[DataFrame] = Nil

    def current: CorpusIndex = cur

    /** Union the admitted docs' index rows into the corpus index. When
      * the index carries Bloom sketches, the admitted rows are ALSO
      * folded in via [[Dedup.mergeBlooms]] (sketch the increment, merge
      * bit-compatible filters) — a stale sketch is the one way the
      * bloom design yields a false negative (a just-admitted doc's
      * later duplicate pruned before the join), so refresh and merge
      * are inseparable. */
    private[streaming] def admit(admittedFp: DataFrame,
        admittedSig: DataFrame): Unit = synchronized {
      val nblooms = cur.blooms.map(b =>
        Dedup.mergeBlooms(b, admittedFp, admittedSig))
      // Eager localCheckpoint: materializes (the next micro-batch reads
      // blocks, not a growing union plan) AND cuts lineage, keeping the
      // self-containment invariant the class scaladoc explains.
      val nfp = cur.fp.union(admittedFp).localCheckpoint(true)
      val nsig = cur.sig.union(admittedSig).localCheckpoint(true)
      val old = owned
      owned = List(nfp, nsig)
      cur = CorpusIndex(nfp, nsig, nblooms)
      old.foreach(df =>
        try graft.operators.Features.freeFrame(df)
        catch { case _: Exception => () })
    }

    /** Drop the frames this refresher materialized (end-of-stream
      * cleanup) — [[graft.operators.Features.freeFrame]] frees the
      * checkpoint-backed generations. */
    def close(): Unit = synchronized {
      owned.foreach(df =>
        try graft.operators.Features.freeFrame(df)
        catch { case _: Exception => () })
      owned = Nil
      cur = initial
    }
  }

  /** BATCHID-TRANSACTIONAL DECISION LOG — the sink that closes the
    * marker-side replay window (the standard Spark exactly-once
    * recipe the object scaladoc describes): each batch's decisions
    * are written as ONE parquet partition keyed by `batch_id`, in
    * dynamic partition-overwrite mode, so a replay of batch N (crash
    * after `onBatch` ran but before the `onceMarkers` write) REPLACES
    * partition `batch_id=N` instead of appending a duplicate copy.
    * Idempotent-by-construction: any number of replays of the same
    * batch converge to exactly one copy of its rows (an append-mode
    * log would double them — `DedupStreamsSpec` proves both the
    * overwrite and the count). With this sink as `onBatch`, the loop
    * is exactly-once END-TO-END: offsets journal in the checkpoint,
    * completed-batch replays skip via markers, and the one
    * crash-window replay that can still re-run `onBatch` overwrites
    * its own partition.
    *
    * Scale posture: one partition directory per micro-batch, written
    * by the batch's own tasks (no extra shuffle); the overwrite
    * resolves per-partition (only `batch_id=N` is touched — dynamic
    * mode never truncates sibling batches); readers get a plain
    * partitioned parquet table pruned by `batch_id`. */
  final class DecisionLog(dir: String) {
    /** The `onBatch` function: write this batch's decision frame as
      * its own overwrite-by-batchId partition. */
    def write(decisions: DataFrame, batchId: Long): Unit =
      decisions.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(dir)

    /** The accumulated decision table across all logged batches. */
    def read(spark: SparkSession): DataFrame = spark.read.parquet(dir)
  }

  /** Durable batchId-idempotency markers: `<dir>/<batchId>.done` exists
    * ⇔ that batch's `onBatch` + admit completed. Hadoop FS so the
    * marker dir can live next to the checkpoint on any supported store. */
  private def markerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(dir, s"$batchId.done")

  private def markerFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One micro-batch of the ingest loop — factored out of the
    * `foreachBatch` closure so the replay-idempotency path is directly
    * unit-testable (a real crash between `onBatch` and the offset commit
    * can't be scheduled deterministically from a spec).
    *
    * @return true if the batch was processed, false if its `onceMarkers`
    *         marker said it already completed (replay after crash). */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      index: CorpusIndex, refresher: Option[RefreshingIndex],
      onceMarkers: Option[String],
      onBatch: (DataFrame, Long) => Unit): Boolean = {
    val spark = batch.sparkSession
    val alreadyDone = onceMarkers.exists(dir =>
      markerFs(spark, dir).exists(markerPath(dir, batchId)))
    if (alreadyDone) false
    else {
      val idx = refresher.map(_.current).getOrElse(index)
      // The batch's derived rows feed the cascade AND (under refresh)
      // the index update — persist so the cascade runs once each.
      val batchFp = Dedup.contentFpOf(batch).persist()
      val batchSig = Dedup.minhashSigOf(batch).persist()
      val decisions = Dedup.incrementalDecisions(
        newFp = batchFp, newSig = batchSig,
        corpusFp = idx.fp, corpusSig = idx.sig,
        blooms = idx.blooms).persist()
      try {
        onBatch(decisions, batchId)
        refresher.foreach { r =>
          val admitted = decisions
            .filter(col("status") === "unique").select(col("doc_id"))
          r.admit(batchFp.join(admitted, "doc_id"),
            batchSig.join(admitted, "doc_id"))
        }
        // Marker LAST: written only once the batch's effects are fully
        // applied, so a crash anywhere above leaves no marker and the
        // replay re-runs the whole batch. Replays of COMPLETED batches
        // are deduplicated; a crash between onBatch and this write still
        // re-applies onBatch (see object scaladoc — closing that window
        // is the sink's batchId-transactionality, not this loop's).
        onceMarkers.foreach { dir =>
          val fs = markerFs(spark, dir)
          fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
          fs.create(markerPath(dir, batchId), true).close()
        }
      } finally {
        decisions.unpersist(blocking = false)
        batchFp.unpersist(blocking = false)
        batchSig.unpersist(blocking = false)
      }
      true
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
    *    fixed corpus (the batch-q69-equivalence configuration);
    *  - `onceMarkers`: durable directory for batchId completion markers —
    *    deduplicates replays of completed batches, narrowing
    *    `foreachBatch`'s at-least-once window to the crash-between-
    *    onBatch-and-marker case (see object scaladoc; omit if `onBatch`
    *    is already idempotent, e.g. an overwrite-by-batchId sink, which
    *    also closes that residual window). */
  def incrementalDedup(newDocs: DataFrame, index: CorpusIndex,
      checkpointLocation: Option[String] = None,
      refresher: Option[RefreshingIndex] = None,
      onceMarkers: Option[String] = None)(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val writer = newDocs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, index, refresher, onceMarkers, onBatch)
        ()
    }
    checkpointLocation.fold(writer)(loc =>
      writer.option("checkpointLocation", loc))
  }
}
