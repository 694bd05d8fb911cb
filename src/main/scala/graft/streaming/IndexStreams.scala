package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{Features, Similarity}

/** Streaming IVF CELL-BALANCE MONITOR — q130's index-health profile as
  * INGEST STATE: each micro-batch of incoming vectors is assigned to
  * its coarse cell against a FROZEN codebook (the blessed corpus
  * build's centroid table, shipped like the quality gate's LM and the
  * DSIR log-ratio artifact — a stream-trained codebook would drift
  * under the very load imbalance this monitor exists to catch), and
  * the per-cell running counts accumulate so every batch emits q130's
  * exact report shape (cell, n_vectors, share_u, load_u) over
  * EVERYTHING ingested so far. A vector feed that starts concentrating
  * into one cell (an encoder change, a topical flood) drives that
  * cell's load factor up mid-stream — the hot-cell latency tail is
  * visible while it is forming, not at the next index rebuild.
  *
  * Assignment parity is structural: the scorer is literally
  * [[graft.operators.Similarity.ivfAssignOver]], the batch q130 code
  * path, so a vector gets the same cell streaming in as it would at
  * index build. State is K int64 counters (the codebook is the domain,
  * fixed and tiny), exact by construction ⇒ after any prefix of
  * batches the emitted report equals batch q130 replayed over
  * everything seen (spec-pinned at every boundary).
  *
  * Scale posture: per batch — one fixed-point scale, one broadcast
  * codebook cross-join into the hash-aggregable argmax (q44's build
  * plan), one K-cell aggregate whose K rows update driver state; the
  * emitted report is codebook-sized. Nothing stateful crosses an
  * executor boundary.
  */
object IndexStreams {

  /** Running per-cell counts over the frozen codebook domain.
    *
    * Failure contract (foreachBatch is at-least-once): a REPLAYED
    * completed batch arrives with the SAME batchId (Spark's replay
    * contract — the mechanism [[DedupStreams]]' batchId markers use),
    * so [[add]] ignores batchIds at or below the high-water mark and a
    * replay cannot double-count; its report is re-emitted from the
    * unchanged state, making replay fully idempotent. A RESTART with a
    * fresh CellCounts would lose the prefix — production persists
    * [[snapshot]] per batch and restores via [[CellCounts.restore]]
    * (K+1 longs — trivially durable). */
  final class CellCounts(domain: Seq[Long]) {
    private val counts = mutable.Map[Long, Long](domain.map(_ -> 0L): _*)
    private var lastBatchId: Long = -1L

    private[streaming] def add(batchId: Long,
        cellCounts: Seq[(Long, Long)]): Boolean =
      synchronized {
        if (batchId <= lastBatchId) false // replayed batch: state is final
        else {
          cellCounts.foreach { case (c, n) =>
            counts.update(c, counts.getOrElse(c, 0L) + n)
          }
          lastBatchId = batchId
          true
        }
      }

    private[streaming] def current: Seq[(Long, Long)] =
      synchronized { counts.toSeq.sortBy(_._1) }

    /** Durable (batchId, per-cell counts) snapshot — persist per batch
      * to make a restart state-faithful. */
    def snapshot: (Long, Seq[(Long, Long)]) =
      synchronized { (lastBatchId, counts.toSeq.sortBy(_._1)) }
  }

  object CellCounts {
    /** Restore a persisted [[CellCounts#snapshot]] so a restarted
      * monitor continues from everything the previous incarnation
      * counted (and keeps ignoring replays of its last batch). */
    def restore(saved: (Long, Seq[(Long, Long)])): CellCounts = {
      val cc = new CellCounts(saved._2.map(_._1))
      cc.synchronized {
        saved._2.foreach { case (c, n) => cc.counts.update(c, n) }
        cc.lastBatchId = saved._1
      }
      cc
    }
  }

  /** q130's report arithmetic over a (cell, n_vectors) snapshot —
    * shared shape with the batch query so the stream cannot drift. */
  private def report(spark: SparkSession,
      cells: Seq[(Long, Long)]): DataFrame = {
    val k = cells.size.toLong
    val total = cells.map(_._2).sum
    val rows = cells.map { case (c, n) =>
      val share = if (total == 0L) 0L
        else math.floor(1000000.0 * n.toDouble / total.toDouble).toLong
      val load = if (total == 0L) 0L
        else math.floor(1000000.0 * (n * k).toDouble / total.toDouble).toLong
      Row(c, n, share, load)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("cell", LongType), StructField("n_vectors", LongType),
        StructField("share_u", LongType), StructField("load_u", LongType))))
  }

  /** Start the monitor over a streaming `(vec_id, embedding, …)` frame.
    * `codebook` is the STATIC frozen centroid table
    * ([[graft.operators.Similarity.ivfCodebook]]); its `c_label` rows
    * are the cell domain, so emptied cells report zero from batch one.
    * Per batch, `onBatch` receives the running q130-shaped profile. */
  def cellBalanceMonitor(embs: DataFrame, codebook: DataFrame,
      state: CellCounts, onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = embs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val assigned = Similarity.ivfAssignOver(
          Features.scaledEmbOver(batch), codebook)
        // K-cell aggregate: the only driver-side materialization is the
        // codebook-sized count row set (report-shaped by construction).
        val batchCounts = assigned
          .groupBy(col("cell").cast(LongType).as("cell"))
          .agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
        // A replayed batchId is a no-op on state; the report is still
        // re-emitted (from the unchanged counts) so the sink sees the
        // same rows it may have lost — replay is fully idempotent.
        state.add(batchId, batchCounts)
        onBatch(report(spark, state.current), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** Build a [[CellCounts]] whose domain is the codebook's cells. */
  def emptyState(codebook: DataFrame): CellCounts =
    new CellCounts(
      codebook.select(col("c_label").cast("long")).collect()
        .map(_.getLong(0)).toSeq)
}
