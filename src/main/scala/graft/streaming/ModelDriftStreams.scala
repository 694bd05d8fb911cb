package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.pipeline.LabelDict

/** MODEL-DRIFT MONITOR — prediction-share PSI over the SERVED model's
  * output stream, the label-shift detector that closes the trained
  * model's lifecycle (train → ship → serve → monitor): the class mix a
  * healthy feed produces under a frozen model is stable, so a moving
  * prediction share means either the FEED changed (upstream mix shift)
  * or the inputs drifted into the model's uncertain region — both
  * reasons to page before anyone trusts the labels. This watches the
  * model's OUTPUT where [[PsiStreams]] watches an input marginal and
  * [[DriftStreams]] the embedding geometry; together they localize a
  * drift alarm to feed-vs-representation-vs-decision.
  *
  * Exactness: state is `classes` int64 prediction counters — bounded
  * forever, regardless of stream length — and the PSI arithmetic is
  * the PsiStreams cell recipe verbatim (Laplace smoothing over the
  * fixed class domain, per-cell micro-nat floor, exact int64 sum), so
  * every emitted statistic is bit-identical to a driver replay over
  * everything seen (spec-pinned at every batch boundary).
  *
  * Frozen-artifact posture: the reference share is computed BATCH-side
  * from the trusted corpus' predictions under the SAME model
  * ([[referenceCounts]]) and ships in the closure — a stream-updated
  * reference would absorb exactly the drift this monitor exists to
  * catch.
  *
  * Scale posture: predictions reduce map-side to per-class counts;
  * one snapshot row per batch. Rows whose label is outside the
  * dictionary are ignored — they cannot arise from the pipeline's own
  * scorers, which emit `labels(idx)` by construction. */
object ModelDriftStreams {

  final case class ShareState(counts: Array[Long])

  /** Running totals after a batch: predictions seen, exact PSI vs the
    * frozen reference, and the per-class counts (dictionary order). */
  final case class ShareSnapshot(n_preds: Long, psi_u: Long,
      counts: Seq[Long])

  /** [[PsiStreams.psiU]]'s identical double-op sequence over a
    * parametric class domain (one subtraction, one ln of a
    * correctly-rounded ratio, left-associated multiply, micro-floor,
    * exact int64 sum). */
  def psiU(counts: Array[Long], ref: Array[Long]): Long = {
    require(counts.length == ref.length, "class domains differ")
    val k = counts.length
    val nS = counts.sum
    val nC = ref.sum
    var acc = 0L
    var i = 0
    while (i < k) {
      val ps = (counts(i) + 1L).toDouble / (nS + k).toDouble
      val pc = (ref(i) + 1L).toDouble / (nC + k).toDouble
      acc += math.floor(1000000.0 * (ps - pc) * math.log(ps / pc)).toLong
      i += 1
    }
    acc
  }

  /** The frozen reference: per-class prediction counts of the trusted
    * corpus under the same model — `classes` longs, ships in the
    * closure. `preds` needs a `label` column (a batch
    * [[graft.pipeline.Infer.classify]] output). */
  def referenceCounts(preds: DataFrame, labels: LabelDict): Array[Long] = {
    import preds.sparkSession.implicits._
    val byLabel = preds.select(col("label")).as[String].rdd
      .map((_, 1L)).reduceByKey(_ + _).collect().toMap
    require(byLabel.nonEmpty,
      "referenceCounts: the trusted reference prediction frame is empty")
    Array.tabulate(labels.size)(i => byLabel.getOrElse(labels(i), 0L))
  }

  /** Pure state transition, shared with the spec's replay. */
  private[graft] def advance(batchLabels: Iterator[String],
      idxOf: Map[String, Int], k: Int, ref: Array[Long],
      state: GroupState[ShareState]): ShareSnapshot = {
    val counts =
      if (state.exists) state.get.counts.clone()
      else new Array[Long](k)
    batchLabels.foreach(l => idxOf.get(l).foreach(counts(_) += 1L))
    state.update(ShareState(counts))
    ShareSnapshot(counts.sum, psiU(counts, ref), counts.toSeq)
  }

  /** The running share snapshot, updated every micro-batch (use with
    * `outputMode("update")`). `preds` needs a `label` column — chain
    * it straight off a streaming `Infer.classify`. */
  def shares(preds: DataFrame, labels: LabelDict,
      ref: Array[Long]): Dataset[ShareSnapshot] = {
    import preds.sparkSession.implicits._
    val k = labels.size
    val idxOf = labels.labels.zipWithIndex.toMap
    preds.select(col("label")).as[String]
      .groupByKey(_ => 0)
      .mapGroupsWithState[ShareState, ShareSnapshot](
        GroupStateTimeout.NoTimeout()) { (_, rows, state) =>
        advance(rows, idxOf, k, ref, state)
      }
  }
}
