package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Ship q151's corpus-version manifest as a real ARTIFACT and read it
  * back for the q153 diff — the ShardWriter move (plan → executed
  * write) applied to the manifest family. q151 computes the per-source
  * fingerprint; this object is the lifecycle around it:
  *
  *  - [[write]] persists the full manifest (row count, language count,
  *    char sum, id range, two-lane XOR checksum per source) as a
  *    single-file parquet snapshot — |sources| rows, the cheapest
  *    artifact in the pipeline;
  *  - [[diffAgainstStored]] reads a STORED snapshot and classifies
  *    every source of a live corpus as unchanged / changed / new /
  *    removed against it, without touching the stored corpus' bytes —
  *    the production shape of q153, where "yesterday" is a 24-byte-
  *    per-source read, not a second 100 TB scan.
  *
  * `Curate` writes this artifact beside every shipped corpus
  * (`<out>/manifest/`), so the next curation run can decide per source
  * whether anything needs rebuilding by diffing two tiny frames.
  *
  * Scale posture: the write is `coalesce(1)` over |sources| rows
  * (trivially driver-safe); the diff is one partial-aggregable scan of
  * the CURRENT corpus plus a |sources|-row parquet read, joined
  * full-outer on source — the stored side's cost is independent of
  * corpus size, which is the entire point of keeping manifests. */
object ManifestWriter {

  /** Compute the full q151-shape manifest of `docs` and persist it to
    * `dir` as one parquet file. Returns the artifact as re-read from
    * disk, so callers hold exactly what a later run will see. */
  def write(docs: DataFrame, dir: String): DataFrame = {
    val spark = docs.sparkSession
    TextAnalysis.corpusManifest(docs)
      .coalesce(1)
      .write.parquet(dir)
    read(spark, dir)
  }

  /** Read a stored manifest artifact. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** q153 against a STORED snapshot: classify each source of the live
    * `current` corpus as unchanged / changed / new / removed relative
    * to the artifact at `storedDir`, with doc/char deltas. Pinned
    * equal to the in-session q153 diff by `ManifestWriterSpec`. */
  def diffAgainstStored(current: DataFrame, storedDir: String): DataFrame =
    TextAnalysis.manifestDiff(
      TextAnalysis.manifestOf(current),
      read(current.sparkSession, storedDir)
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("checksum"), col("checksum_b")))

  // ------------------------------------------------------------ ledger
  // The manifest at DOC granularity: q159's stored side. The manifest
  // answers "which sources changed" for free; the ledger answers
  // "which documents changed" for ~48 bytes/doc — still three orders
  // of magnitude under the corpus, and the input the incremental
  // layers (q69's new batch, q148's delta leg) actually consume.

  /** Persist the doc-level fingerprint ledger `(doc_id, source, fp,
    * n_chars)` of `docs`. Unlike [[write]], this is corpus-row-sized,
    * so it keeps Spark's parallel write layout (no `coalesce`) — at
    * 100 TB the ledger is a normal partitioned table, just a narrow
    * one. Returns the artifact as re-read from disk. */
  def writeLedger(docs: DataFrame, dir: String): DataFrame = {
    TextAnalysis.docLedgerOf(docs).write.parquet(dir)
    read(docs.sparkSession, dir)
  }

  /** q159 against a STORED ledger: classify every document of the live
    * `current` corpus as added / changed / unchanged (and stored docs
    * absent from it as removed), aggregated per (source, status) with
    * char deltas. One fingerprint-sized full-outer join — the stored
    * corpus' bytes are never read. Pinned equal to the in-session
    * q159 delta by `DeltaLedgerSpec`, which also plants the `removed`
    * class the subset fixture cannot produce. */
  def deltaAgainstStoredLedger(current: DataFrame,
      storedDir: String): DataFrame =
    TextAnalysis.ledgerDelta(
      TextAnalysis.docLedgerOf(current),
      read(current.sparkSession, storedDir)
        .select(col("doc_id"), col("source"), col("fp"), col("n_chars")))
}
