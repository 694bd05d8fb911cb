package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.{Features, Similarity}

/** STREAMING near-dup threshold-curve monitor — batch q251 as INGEST
  * STATE (round-16 verdict task 7). q251 prices the single most
  * consequential dedup knob: at a loose cosine threshold the admitted
  * pair set is quadratic in cluster size, so the threshold chooses the
  * OUTPUT VOLUME. The batch curve is the pre-flight audit; this
  * monitor is the same curve DRIFTING LIVE: as embedding micro-batches
  * land, each batch's candidate pairs (new×standing + new×new, the
  * exact q251 bucket key and cosine via
  * [[graft.operators.Similarity.curveBandCounts]]) are histogrammed
  * into the same 0.05-wide cosine bands, band counts accumulate in
  * driver state, and every batch emits q251's exact report shape over
  * EVERYTHING seen. A corpus that starts densifying (an encoder
  * change, a topical flood, a duplicate storm) bends the curve — the
  * admitted-volume blowout the incremental dedup path (q69/q72) would
  * hit is visible while it forms, not at the next batch audit. The
  * pre-flight guard's budget line (`spark.graft.neardup
  * .autoBudgetPairs`) can be read straight off the emitted
  * `n_admitted` column.
  *
  * Prefix-exactness is structural: every unordered same-bucket pair
  * has exactly one "new" end, so summing per-batch increments equals
  * batch q251's one-shot histogram over the union — int64 counts, no
  * approximation (`ThresholdCurveStreamsSpec` pins row equality at
  * every batch boundary).
  *
  * State: ≤41 int64 band counters (driver, [[BandCounts]] — same
  * replay-idempotent batchId high-water contract as
  * [[IndexStreams.CellCounts]]) plus the standing bucketed corpus
  * ([[StandingVectors]], the [[DedupStreams]] RefreshingIndex move:
  * new vectors join the corpus AFTER their batch is counted, so a
  * replay can neither double-count nor double-admit). At warehouse
  * scale the standing side is the persisted bucketed vector index the
  * incremental dedup path already maintains — this monitor adds one
  * bucket equi-join and a ≤41-cell aggregate per batch. */
object ThresholdCurveStreams {

  /** Running band counters with replay idempotence. */
  final class BandCounts {
    private val counts = mutable.Map.empty[Long, Long]
    private var lastBatchId: Long = -1L

    private[streaming] def add(batchId: Long,
        bandCounts: Seq[(Long, Long)]): Boolean =
      synchronized {
        if (batchId <= lastBatchId) false
        else {
          bandCounts.foreach { case (b, n) =>
            counts.update(b, counts.getOrElse(b, 0L) + n)
          }
          lastBatchId = batchId
          true
        }
      }

    private[streaming] def current: Seq[(Long, Long)] =
      synchronized { counts.toSeq.sortBy(-_._1) }

    /** Durable snapshot — persist per batch for restart fidelity. */
    def snapshot: (Long, Seq[(Long, Long)]) =
      synchronized { (lastBatchId, counts.toSeq.sortBy(_._1)) }
  }

  object BandCounts {
    def restore(saved: (Long, Seq[(Long, Long)])): BandCounts = {
      val bc = new BandCounts
      bc.synchronized {
        saved._2.foreach { case (b, n) => bc.counts.update(b, n) }
        bc.lastBatchId = saved._1
      }
      bc
    }
  }

  /** The standing scaled corpus the next batch's cross pairs join —
    * grows only when a batch is counted for the first time. */
  final class StandingVectors(spark: SparkSession) {
    @volatile private var cur: Option[DataFrame] = None
    private[streaming] def current: Option[DataFrame] = cur
    private[streaming] def admit(scaled: DataFrame): Unit = synchronized {
      // localCheckpoint: the standing side is re-joined every batch and
      // must not replan the whole ingest lineage each time (the
      // DedupStreams edge-cache posture).
      val add = scaled.select("vec_id", "sv", "n2").localCheckpoint()
      cur = Some(cur.fold(add)(_.unionByName(add).localCheckpoint()))
    }
  }

  /** q251's report arithmetic over the accumulated bands — ≤41 rows of
    * driver math, byte-compatible columns with the batch query. */
  private def report(spark: SparkSession,
      bands: Seq[(Long, Long)]): DataFrame = {
    val total = bands.map(_._2).sum
    var cum = 0L
    val rows = bands.sortBy(-_._1).map { case (b, n) =>
      cum += n
      val frac = if (total == 0L) 0L else 1000000L * cum / total
      Row(b, b * 50000L, n, cum, frac)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("band", LongType), StructField("thr_u", LongType),
        StructField("n_pairs", LongType), StructField("n_admitted", LongType),
        StructField("admit_frac_u", LongType))))
  }

  /** Start the monitor over a streaming `(vec_id, embedding, …)` frame.
    * Per batch, `onBatch` receives the running q251-shaped curve. */
  def thresholdCurveMonitor(embs: DataFrame, bands: BandCounts,
      standing: StandingVectors, onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = embs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val scaled = Features.scaledEmbOver(batch)
          .select("vec_id", "sv", "n2").localCheckpoint()
        // First batch: no standing corpus yet — intra-batch pairs only.
        val inc = Similarity.curveBandCounts(spark, scaled,
          standing.current.getOrElse(scaled.limit(0)))
        val bandCounts = inc.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toSeq
        // Replay contract: a replayed batchId neither re-counts nor
        // re-admits; its report re-emits from the unchanged state.
        if (bands.add(batchId, bandCounts)) standing.admit(scaled)
        onBatch(report(spark, bands.current), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
