package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomExprs
import graft.operators.Dedup

/** Streaming SOURCE-NOVELTY MONITOR — q122's marginal-novelty valuation
  * as an ingest-time dashboard: per micro-batch, each source's distinct
  * word-3-gram shingles and how many of them the stream has NEVER seen
  * before, with the within-batch first-owner attribution q122 uses
  * (min(source) per fresh shingle). A live feed whose novelty rate
  * decays to zero has started reselling content the corpus already
  * ingested — the signal a crawl operator wants while the feed is
  * still streaming, not at the next corpus-wide batch audit.
  *
  * STATE IS A BLOOM FILTER, BY NECESSITY: the exact seen-shingle set
  * grows with the stream (at crawl scale it IS the stream), so the
  * monitor keeps a few-hundred-KB membership sketch instead — the same
  * `util.sketch.BloomFilter` the incremental-dedup pre-filter ships
  * ([[graft.operators.Dedup.corpusBlooms]]), built distributedly per
  * batch via `stat.bloomFilter` and merged into the running state with
  * `mergeInPlace` (never a driver-side element loop). The bias is
  * one-sided and documented: false positives make a genuinely-novel
  * shingle look seen, so the monitor UNDER-counts novelty by at most
  * the configured fpp — the safe direction for an alarm that fires on
  * novelty DECAY (a false positive can only make the alarm earlier,
  * never suppress it). At fpp 10⁻⁶ the bound is invisible; the spec
  * runs there and pins exact batch-q122 agreement.
  *
  * Scale posture: per batch, one shingle explode + one distinct
  * (source, h) aggregate + one codegen'd scan-position membership test
  * ([[graft.functions.BloomMightContain]]) + one sources-sized groupBy;
  * the state sketch rides the PLAN to every task (a broadcast-sized
  * literal), and the state update is one distributed sketch build +
  * an O(bits) merge on the driver. No shuffle carries anything wider
  * than an 8-byte hash.
  */
object NoveltyStreams {

  /** The running seen-shingle sketch. `expectedItems`/`fpp` size the
    * filter once; increments merge bit-compatibly forever after
    * (Bloom filters of equal geometry are closed under OR).
    *
    * Failure contract (the two at-least-once cases differ):
    *  - REPLAY of a completed batch (crash between foreachBatch and the
    *    offset commit): the Bloom OR is idempotent, so state stays
    *    correct; the replayed batch's REPORT scores its own content as
    *    already-seen — a novelty UNDER-count, the safe direction for a
    *    decay alarm.
    *  - RESTART with a fresh state object: ingestion resumes against an
    *    EMPTY sketch and re-shipped content scores as novel — the
    *    unsafe OVER-count. Production therefore persists the sketch
    *    alongside the checkpoint: [[snapshot]] after each batch,
    *    [[SeenShingles.fromSnapshot]] on restart (a few hundred KB —
    *    the same artifact cadence as the dedup corpus blooms). */
  final class SeenShingles private (val expectedItems: Long,
      val fpp: Double, initial: BloomFilter) {
    def this(expectedItems: Long = 1000000L, fpp: Double = 1e-6) =
      this(expectedItems, fpp, BloomFilter.create(expectedItems, fpp))
    @volatile private var bloom: BloomFilter = initial

    private[streaming] def serialized: Array[Byte] =
      BloomExprs.serialize(bloom)

    /** Durable snapshot of the current sketch WITH its geometry —
      * persist it per batch to make a restart state-faithful (merges
      * are only defined between filters of identical geometry, so the
      * snapshot must carry it). */
    def snapshot: (Long, Double, Array[Byte]) =
      (expectedItems, fpp, serialized)

    /** Fold a batch's distinct hash-string column into the state:
      * sketch the increment distributedly, OR it in. Empty frames are
      * legitimate (a batch of sub-3-token docs has no shingles) and
      * `stat.bloomFilter` NPEs on them — same guard as
      * [[graft.operators.Dedup.corpusBlooms]]. */
    private[streaming] def merge(hashes: DataFrame, column: String): Unit =
      if (!hashes.isEmpty)
        bloom.mergeInPlace(hashes.stat.bloomFilter(column, expectedItems, fpp))
  }

  object SeenShingles {
    /** Restore a persisted sketch ([[SeenShingles#snapshot]]) so a
      * restarted stream scores against everything the previous
      * incarnation saw — the geometry rides in the snapshot, so the
      * restored state keeps building bit-compatible increments. */
    def fromSnapshot(saved: (Long, Double, Array[Byte])): SeenShingles =
      new SeenShingles(saved._1, saved._2,
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(saved._3)))
  }

  /** Start the monitor over a streaming `(doc_id, text, source, …)`
    * frame. Per batch, `onBatch` receives the per-source report
    * `(source, n_shingles, n_novel, novelty_u)` — novel = first seen
    * on this stream AND first-owned within the batch (q122's
    * min(source) attribution), novelty_u the micro-unit rate. */
  def monitor(docs: DataFrame, state: SeenShingles,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    // call_function resolves through the session registry — make sure
    // the engine functions exist on sessions not built via GraftSession.
    graft.plans.GraftExtensions.register(docs.sparkSession)
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Persist the per-batch shingle frame: the report reads it from
        // two aggregation sides and the state merge twice more
        // (isEmpty + the sketch build) — unpersisted, the explode +
        // doc join + distinct would run ~4x per batch.
        val sh = Dedup.hashedShinglesOver(batch)
          .join(batch.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("h").cast("string").as("hs"))
          .distinct()
          .persist()
        try {
          // Capture the PRE-batch state as a plan literal: the report
          // must score against what was seen before this batch, and the
          // merge below must not be able to leak into it.
          val seen = state.serialized
          val owners = sh
            .filter(!BloomExprs.mightContain(col("hs"), seen))
            .groupBy(col("hs")).agg(min(col("source")).as("source"))
            .groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
          val report = sh.groupBy(col("source"))
            .agg(count(lit(1)).as("n_shingles"))
            .join(owners, Seq("source"), "left")
            .na.fill(0L, Seq("n_novel"))
            .withColumn("novelty_u",
              floor(lit(1000000.0) * col("n_novel").cast("double") /
                col("n_shingles").cast("double")).cast("long"))
          onBatch(report, batchId)
          state.merge(sh.select(col("hs")), "hs")
        } finally sh.unpersist()
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
