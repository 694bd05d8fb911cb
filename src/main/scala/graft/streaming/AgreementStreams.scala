package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING LABEL-AGREEMENT (KAPPA) MONITOR — batch q186 watched
  * live: as labeled vectors arrive per source, each is scored by the
  * UNGATED centroid argmax (the q169/q186 instrument — no confident
  * threshold, unlike [[NoiseStreams]]: kappa corrects for chance
  * explicitly, so it wants the full confusion mass, abstentions would
  * re-bias the marginals) and the per-source confusion cells
  * accumulate. Per source the snapshot reports support, raw agreement,
  * p_o, p_e and Cohen's κ — the chance-corrected number that separates
  * "this feed is single-class and trivially agrees" from "this feed's
  * labels genuinely track the blessed geometry".
  *
  * Frozen-artifact posture: the per-label centroids ship in the
  * closure ([[NoiseStreams.NoiseRef]] — the thresholds it carries are
  * deliberately unused here). A stream-updated artifact would absorb
  * exactly the label drift being watched.
  *
  * Exactness: scoring replays batch [[graft.operators.Similarity]]'s
  * `ivfAssignOver` op-for-op — `floor(x·10⁴)` quantization, exact
  * int64 dot, the RAW double cosine compare (not the micro-floored
  * one: the batch argmax ranks unfloored cosines), strict > with
  * ascending labels = ties to the LOWER label; κ is the exact q186
  * rational with `Math.floorDiv` (the same floor division the batch
  * query spells as (x − pmod(x,y))/y). With the corpus' own reference
  * the final-boundary snapshot is bit-equal to batch q186 per source
  * (spec-pinned).
  *
  * Scale posture — the [[TrainStreams]] foreachBatch fold: scoring is
  * a per-row map (artifact broadcasts in the closure), each batch
  * collapses map-side to ≤ |sources|·(k+1)² (source, given, pred)
  * cells, and the driver folds those into bounded int64 counters.
  * Given labels OUTSIDE the artifact are kept as ordinary confusion
  * rows (they can never agree — exactly the batch semantics, which
  * trusts the feed's `label` column as-is); predictions are always
  * artifact labels. A replayed batch id folds nothing. Deliberately no
  * checkpointLocation ([[TrainStreams.monitor]]'s rationale). */
object AgreementStreams {

  import NoiseStreams.NoiseRef

  /** Running per-source agreement after a batch (q186's columns). */
  final case class KappaSnapshot(source: String, n_vecs: Long, agree: Long,
      po_u: Long, pe_u: Long, kappa_u: Long)

  /** Batch `ivfAssignOver`'s scoring arithmetic, op-for-op, for ONE
    * raw vector: the plain argmax label over RAW double cosines,
    * strict > with ascending labels = ties to the LOWER label. Pure —
    * shared by the executor map and the spec's replay. */
  def assignOne(ref: NoiseRef, emb: Array[Float]): Int = {
    val dim = ref.cents(0).length
    require(emb.length == dim,
      s"AgreementStreams: got a ${emb.length}-dim vector, artifact is $dim-dim")
    val sv = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      sv(i) = math.floor(emb(i).toDouble * 10000.0).toLong
      i += 1
    }
    var n2 = 0L
    i = 0
    while (i < dim) { n2 += sv(i) * sv(i); i += 1 }
    var best = ref.labels(0)
    var bestCos = Double.NegativeInfinity
    var j = 0
    while (j < ref.labels.length) {
      var d = 0L
      var t = 0
      val c = ref.cents(j)
      while (t < c.length) { d += sv(t) * c(t); t += 1 }
      val cos = d.toDouble / math.sqrt(n2.toDouble * ref.cn2(j).toDouble)
      if (cos > bestCos) { bestCos = cos; best = ref.labels(j) }
      j += 1
    }
    best
  }

  /** q186's exact κ arithmetic over one source's confusion cells —
    * ONE implementation for the stream snapshot and the spec's batch
    * cross-check (the batch query spells the identical floor division
    * as (x − pmod(x, y)) / y). */
  private[graft] def kappaOf(cells: Map[(Long, Long), Long]): (Long, Long, Long, Long, Long) = {
    val n = cells.valuesIterator.sum
    val agree = cells.collect { case ((g, p), c) if g == p => c }.sum
    val gj = cells.groupBy(_._1._1).view.mapValues(_.valuesIterator.sum)
    val pj = cells.groupBy(_._1._2).view.mapValues(_.valuesIterator.sum).toMap
    val chance = gj.iterator.map { case (j, gn) =>
      gn * pj.getOrElse(j, 0L)
    }.sum
    val poU = Math.floorDiv(1000000L * agree, n)
    val peU = Math.floorDiv(1000000L * chance, n * n)
    val kappaU =
      if (n * n == chance) 0L
      else Math.floorDiv(1000000L * (n * agree - chance), n * n - chance)
    (n, agree, poU, peU, kappaU)
  }

  /** The driver-side fold: scores one micro-batch executor-side,
    * collapses it map-side to (source, given, pred, n) cells, adds
    * them into the bounded per-source confusion state, and returns the
    * running per-source snapshots (source order). A batch id ≤ the
    * last folded id adds nothing (the at-least-once replay guard). */
  private[graft] final class KappaFold(ref: NoiseRef) {
    private val cells =
      scala.collection.mutable.Map.empty[(String, Long, Long), Long]
    private var lastFolded = -1L

    def fold(batch: DataFrame, batchId: Long): Seq[KappaSnapshot] = {
      if (batchId > lastFolded) {
        lastFolded = batchId
        import batch.sparkSession.implicits._
        val r = ref
        batch.select(col("source"), col("label"), col("embedding"))
          .as[(String, Int, Array[Float])]
          .map { case (src, given, emb) =>
            (src, given.toLong, AgreementStreams.assignOne(r, emb).toLong)
          }
          .groupBy(col("_1"), col("_2"), col("_3"))
          .agg(count(lit(1)).as("n"))
          .collect().foreach { row =>
            val k = (row.getString(0), row.getLong(1), row.getLong(2))
            cells.updateWith(k)(c => Some(c.getOrElse(0L) + row.getLong(3)))
          }
      }
      snapshot()
    }

    private def snapshot(): Seq[KappaSnapshot] =
      cells.keys.map(_._1).toSeq.distinct.sorted.map { src =>
        val sc = cells.collect {
          case ((s, g, p), c) if s == src => (g, p) -> c
        }.toMap
        val (n, agree, po, pe, kappa) = kappaOf(sc)
        KappaSnapshot(src, n, agree, po, pe, kappa)
      }
  }

  /** Start the monitor over a streaming labeled-embedding frame (needs
    * `source` string, `label` int, `embedding` array<float>).
    * `onSnapshot(snapshots, batchId)` fires after every micro-batch
    * with the running per-source agreement table. */
  def monitor(feed: DataFrame, ref: NoiseRef,
      onSnapshot: (Seq[KappaSnapshot], Long) => Unit): StreamingQuery = {
    val fold = new KappaFold(ref)
    feed.select(col("source"), col("label"), col("embedding")).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onSnapshot(fold.fold(batch, batchId), batchId)
      }
      .start()
  }
}
