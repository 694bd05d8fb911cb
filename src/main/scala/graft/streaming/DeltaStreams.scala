package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Streaming SNAPSHOT-DELTA MONITOR — q159's changed-document
  * classification at ingest time: every arriving document is scored
  * against the FROZEN stored ledger (the `ManifestWriter.writeLedger`
  * artifact of the last shipped corpus) as `added` (unknown doc_id),
  * `changed` (known id, different fingerprint) or `unchanged` (byte-
  * identical redelivery), and each micro-batch emits the per-(source,
  * status) count/char-delta report. The feed-health question this
  * answers live: is the crawler shipping NEW content, re-shipping
  * bytes we already hold (wasted ingest), or silently mutating
  * documents under stable ids (cache-busting mirrors)?
  *
  * FROZEN-ARTIFACT POSTURE (the `DecontamStreams`/`PqStreams`
  * discipline): the ledger is a versioned batch artifact, read once
  * at stream start and NEVER updated by the stream — a batch job
  * re-ships it with each corpus release. The monitor is therefore
  * stateless: redeliveries within one stream run re-classify
  * identically (at-least-once safe, idempotent per batch report),
  * and two monitors over the same ledger agree bit-for-bit. The
  * `removed` class is structurally invisible to a stream (absence
  * never arrives) — that audit is batch q159's job, stated here so
  * nobody reads the stream report as a full diff.
  *
  * Scale posture: per batch, one fingerprint projection of the
  * micro-batch (narrow, stateless) + ONE doc_id-keyed INNER join
  * against the ledger with the micro-batch side broadcast — inner is
  * the join type where Spark can build EITHER side, so the hint is
  * honored and the corpus-row-sized ledger is streamed past a
  * batch-sized hash table in one scan, no shuffle (a broadcast hint
  * on the preserved side of a left-outer join would be silently
  * ignored and re-plan as a full-ledger sort-merge every batch). The
  * `added` class — live rows with no ledger match — falls out of a
  * second, batch-vs-batch-sized LEFT-ANTI join against the matched
  * ids (both sides micro-batch rows; the match frame is persisted so
  * the ledger is scanned exactly once per batch). Then a
  * |sources|×3-row partial-aggregable groupBy. Nothing wider than a
  * 16-byte hash shuffles. */
object DeltaStreams {

  /** Start the monitor over a streaming `(doc_id, text, source,
    * n_chars, …)` frame. `ledger` is the STORED artifact frame
    * (`ManifestWriter.read` of a `writeLedger` path, or any
    * `docLedgerOf`-shaped static frame). Per batch, `onBatch`
    * receives `(source, status, n_docs, delta_chars)` with status ∈
    * added | changed | unchanged — as a MATERIALIZED local frame (the
    * ≤ |sources|×3-row aggregate is collected before the per-batch
    * cache is released, so an `onBatch` that defers its action — an
    * async writer, a retained handle — can never silently degrade the
    * one-ledger-scan guarantee into a second full scan). */
  def monitor(docs: DataFrame, ledger: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val stored = ledger.select(col("doc_id"), col("fp").as("s_fp"),
      col("n_chars").as("s_chars"))
    val writer = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(batchReport(TextAnalysis.docLedgerOf(batch)
          .withColumnRenamed("fp", "c_fp")
          .withColumnRenamed("n_chars", "c_chars"), stored), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** The one-ledger-scan matched frame: inner join, micro-batch side
    * broadcast (buildable for inner — NOT for the preserved side of a
    * left-outer, where the hint would be silently dropped and the full
    * ledger sort-merged every batch). Exposed so `DeltaPlanSpec` can
    * pin that plan shape — a revert to left-outer turns this into a
    * SortMergeJoin and the pin goes red. */
  private[graft] def matchedOf(live: DataFrame, stored: DataFrame): DataFrame =
    broadcast(live).join(stored, Seq("doc_id"), "inner")

  /** The lazy per-batch report over an already-persisted `matched`
    * frame — shared by [[batchReport]] and the plan pin. */
  private[graft] def reportOver(live: DataFrame,
      matched: DataFrame): DataFrame = {
    // Batch-`ledgerDelta` parity on the matched ids, including BOTH
    // null-fingerprint edges (md5 of NULL text on either side): s_fp
    // null classifies `added`, c_fp null (a live redelivery whose text
    // is NULL) classifies `removed`, and the char delta coalesces both
    // sides — exactly the batch classifier's branch order and
    // arithmetic.
    val known = matched.select(col("source"),
      when(col("s_fp").isNull, lit("added"))
        .when(col("c_fp").isNull, lit("removed"))
        .when(col("c_fp") === col("s_fp"), lit("unchanged"))
        .otherwise(lit("changed")).as("status"),
      (coalesce(col("c_chars"), lit(0L)) -
        coalesce(col("s_chars"), lit(0L))).as("d_chars"))
    val added = live.join(
        broadcast(matched.select(col("doc_id"))),
        Seq("doc_id"), "left_anti")
      .select(col("source"), lit("added").as("status"),
        col("c_chars").as("d_chars"))
    known.unionByName(added)
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("d_chars")).as("delta_chars"))
  }

  /** One batch's classification, fully materialized: persist the
    * ≤ micro-batch-row matched frame (so deriving `added` does not
    * re-scan the ledger), collect the ≤ |sources|×3-row report (a
    * bounded-by-construction aggregate — the one sanctioned collect
    * shape), and only then release the cache. */
  private[graft] def batchReport(live: DataFrame,
      stored: DataFrame): DataFrame = {
    val matched = matchedOf(live, stored).persist()
    try {
      val report = reportOver(live, matched)
      val rows = report.collect()
      report.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), report.schema)
    } finally matched.unpersist(blocking = false)
  }
}
