package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{Features, Similarity}

/** Streaming PQ INDEX INGEST — q135's encode as a continuous path:
  * each micro-batch of incoming vectors is product-quantized against a
  * FROZEN codebook (the blessed corpus build's seed subvectors,
  * shipped like [[IndexStreams]]' IVF centroids, the quality gate's LM
  * and the DSIR log-ratio table — a stream-trained codebook would
  * re-encode history every batch and the index would stop meaning one
  * thing), the batch's code rows are handed to the caller (the index
  * shard append a real deployment runs), and q135's per-(subspace,
  * code) histogram — population AND exact int64 reconstruction SSE —
  * accumulates as ingest state. A vector feed whose encoder drifts
  * shows up as rising SSE in specific subspaces while counts still
  * look healthy; a topical flood shows up as hot codes — both visible
  * per batch, not at the next full index audit.
  *
  * Encode parity is structural: the scorer is literally
  * [[graft.operators.Similarity.pqEncodeOver]], the batch q135/q136
  * code path, so a vector gets the same codes streaming in as it
  * would at index build — spec-pinned: after any prefix of batches
  * the accumulated report equals batch q135 replayed over everything
  * seen, cell for cell.
  *
  * Scale posture: per batch — one fixed-point scale, one broadcast
  * codebook join into the hash-aggregable argmin (q44's assignment
  * shape), one ≤ S·K-cell aggregate whose rows update driver state;
  * the emitted report is codebook-sized. The code rows themselves
  * stay distributed (the caller appends them to its sink); nothing
  * corpus-sized ever reaches the driver.
  */
object PqStreams {

  /** Running per-(subspace, code) population + SSE over the frozen
    * codebook domain.
    *
    * Failure contract (foreachBatch is at-least-once): a replayed
    * completed batch arrives with the SAME batchId, so [[add]] ignores
    * batchIds at or below the high-water mark — replay cannot
    * double-count; the report is re-emitted from the unchanged state.
    * A restart persists/restores [[snapshot]] (S·K (n, sse) pairs). */
  final class PqCounts {
    private val cells = mutable.Map.empty[(Long, Long), (Long, Long)]
    private var lastBatchId: Long = -1L

    private[streaming] def add(batchId: Long,
        batchCells: Seq[((Long, Long), (Long, Long))]): Boolean =
      synchronized {
        if (batchId <= lastBatchId) false
        else {
          batchCells.foreach { case (k, (n, sse)) =>
            val (n0, s0) = cells.getOrElse(k, (0L, 0L))
            cells.update(k, (n0 + n, s0 + sse))
          }
          lastBatchId = batchId
          true
        }
      }

    private[streaming] def current: Seq[((Long, Long), (Long, Long))] =
      synchronized { cells.toSeq.sortBy(_._1) }

    def snapshot: (Long, Seq[((Long, Long), (Long, Long))]) =
      synchronized { (lastBatchId, cells.toSeq.sortBy(_._1)) }
  }

  object PqCounts {
    def restore(saved: (Long, Seq[((Long, Long), (Long, Long))])): PqCounts = {
      val pc = new PqCounts
      pc.synchronized {
        saved._2.foreach { case (k, v) => pc.cells.update(k, v) }
        pc.lastBatchId = saved._1
      }
      pc
    }
  }

  /** q135's report shape over a state snapshot — shared arithmetic
    * with the batch query so the stream cannot drift. */
  private def report(spark: SparkSession,
      cells: Seq[((Long, Long), (Long, Long))]): DataFrame = {
    val rows = cells.map { case ((s, c), (n, sse)) => Row(s, c, n, sse) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("subspace", LongType), StructField("code", LongType),
        StructField("n_vecs", LongType), StructField("sse", LongType))))
  }

  /** Start the ingest over a streaming `(vec_id, embedding, …)` frame.
    * `codebook` is the STATIC frozen [[graft.operators.Similarity.pqCodebook]]
    * frame. Per batch, `onBatch` receives the batch's encoded code rows
    * (vec_id, s, code, d2 — the index-shard append) and the running
    * q135-shaped histogram over everything ingested so far. */
  def encodeIngest(embs: DataFrame, codebook: DataFrame,
      state: PqCounts,
      onBatch: (DataFrame, DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = embs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val codes = Similarity.pqEncodeOver(
          Features.scaledEmbOver(batch), codebook)
        // ≤ S·K cells: the only driver-side materialization is the
        // histogram row set (report-shaped by construction).
        val batchCells = codes
          .groupBy(col("s").cast(LongType).as("subspace"), col("code"))
          .agg(count(lit(1)).as("n"), sum(col("d2")).as("sse"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toSeq
        state.add(batchId, batchCells)
        onBatch(codes, report(spark, state.current), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
