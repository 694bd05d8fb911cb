package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING LABEL-NOISE MONITOR — batch q175's confident-learning
  * joint, watched live: as labeled vectors arrive (a feed of
  * embedded + labeled documents, the input to any training run), each
  * is scored against a FROZEN classifier-trust artifact — the blessed
  * corpus' per-label centroids and per-class confident thresholds
  * ([[graft.operators.Similarity.confidentReference]], derived through
  * the SAME frames as the batch oracle) — and the per-(given, pred)
  * confident joint accumulates. A rising noise count per class means
  * the incoming labels contradict the blessed geometry: a labeling
  * regression, a poisoned feed, or genuine distribution movement —
  * all reasons to quarantine the feed before it trains anything.
  * Completes the per-layer monitor family: PSI watches an input
  * marginal, DriftStreams the geometry, ModelDriftStreams the served
  * output — this watches the LABELS' agreement with the geometry.
  *
  * Frozen-artifact posture: thresholds and centroids come batch-side
  * from the trusted corpus and ship in the closure (classes×(dim+2)
  * longs). A stream-updated artifact would absorb exactly the label
  * drift being watched.
  *
  * Exactness: scoring replays the batch arithmetic op-for-op —
  * `floor(x·10⁴)` component quantization, exact int64 dot, the one
  * multiply / one sqrt / one divide cosine, shifted micro-floor,
  * per-class threshold test, argmax ties to the LOWER label — so with
  * the corpus' own reference the final-boundary snapshot is bit-equal
  * to batch q175 per class (spec-pinned), and every intermediate
  * boundary equals a pure-Scala replay over the fed prefix.
  *
  * Out-of-artifact labels are counted into `n_unknown` (never
  * silently dropped — the [[ModelDriftStreams]] mismatched-dictionary
  * posture): a feed carrying a label id the artifact doesn't know is
  * itself a page condition.
  *
  * Scale posture — the [[TrainStreams]] foreachBatch fold: scoring is
  * a per-row map (no shuffle — the artifact broadcasts in the
  * closure), each batch collapses map-side to ≤ (classes+2)²
  * (given, pred) cells, and the driver folds those into bounded int64
  * counters (classes² + 2 cells forever, regardless of stream
  * length). A replayed batch id folds nothing (the at-least-once
  * replay guard, held driver-side like [[TrainStreams.TrainFold]]'s).
  *
  * Restart posture — deliberately NO checkpointLocation
  * ([[TrainStreams.monitor]]'s rationale): the fold's state lives
  * driver-side; a restarted monitor re-feeds from the beginning or
  * re-seeds from the last persisted snapshot. */
object NoiseStreams {

  /** The frozen classifier-trust artifact: parallel arrays in label
    * order — label ids, exact int64 centroids, squared norms, shifted
    * confident thresholds. */
  final case class NoiseRef(labels: Array[Int], cents: Array[Array[Long]],
      cn2: Array[Long], thr: Array[Long]) {
    require(labels.length == cents.length && labels.length == cn2.length &&
      labels.length == thr.length && labels.nonEmpty,
      "NoiseRef: parallel artifact arrays must agree and be non-empty")
    @transient lazy val idxOf: Map[Int, Int] = labels.zipWithIndex.toMap
  }

  /** Running totals after a batch, per artifact class (label order):
    * support seen, confident count, confidently-contradicted count —
    * plus the out-of-artifact label count (page when > 0). */
  final case class NoiseSnapshot(n_rows: Long, n_unknown: Long,
      labels: Seq[Int], n_vecs: Seq[Long], n_confident: Seq[Long],
      n_noise: Seq[Long])

  /** Batch q182's serving-path score, op-for-op, for ONE raw vector:
    * the per-mille bucket of the TOP centroid cosine (no threshold —
    * the confidence the decision layer actually serves on). Shared by
    * [[ConfStreams]]'s executor map and its spec's replay. */
  def confBucket(ref: NoiseRef, emb: Array[Float]): Long = {
    val (sv, n2) = quantize(ref, emb)
    var best = Long.MinValue
    var j = 0
    while (j < ref.labels.length) {
      val c = cosS(ref, sv, n2, j)
      if (c > best) best = c
      j += 1
    }
    best / 1000L // shifted ⇒ nonnegative ⇒ / is the floor div
  }

  private def quantize(ref: NoiseRef,
      emb: Array[Float]): (Array[Long], Long) = {
    val dim = ref.cents(0).length
    require(emb.length == dim,
      s"NoiseStreams: got a ${emb.length}-dim vector, artifact is $dim-dim")
    val sv = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      sv(i) = math.floor(emb(i).toDouble * 10000.0).toLong
      i += 1
    }
    var n2 = 0L
    i = 0
    while (i < dim) { n2 += sv(i) * sv(i); i += 1 }
    (sv, n2)
  }

  private def cosS(ref: NoiseRef, sv: Array[Long], n2: Long,
      j: Int): Long = {
    var d = 0L
    var t = 0
    val c = ref.cents(j)
    while (t < c.length) { d += sv(t) * c(t); t += 1 }
    math.floor(d.toDouble /
      math.sqrt(n2.toDouble * ref.cn2(j).toDouble) * 1000000.0).toLong +
      1000000L
  }

  /** Batch q175's scoring arithmetic, op-for-op, for ONE raw vector:
    * returns the confident-argmax label, or -1 when no class threshold
    * clears (the abstention guard). Pure — shared by the executor map
    * and the spec's prefix replay. */
  def scoreOne(ref: NoiseRef, emb: Array[Float]): Int = {
    val (sv, n2) = quantize(ref, emb)
    var best = -1
    var bestCos = Long.MinValue
    var j = 0
    while (j < ref.labels.length) {
      val c = cosS(ref, sv, n2, j)
      // strict > with ascending-label scan = ties to the LOWER label
      if (c >= ref.thr(j) && c > bestCos) {
        bestCos = c
        best = ref.labels(j)
      }
      j += 1
    }
    best
  }

  /** The driver-side fold, separated from the query wiring so the
    * replay guard and the unknown-label accounting are directly
    * testable: `fold` scores one micro-batch executor-side, collapses
    * it to ≤ (classes+2)² `(given, pred, n)` cells (map-side combine —
    * the only shuffle), adds them into the bounded joint, and returns
    * the running snapshot; a batch id ≤ the last folded id adds
    * nothing. */
  private[graft] final class NoiseFold(ref: NoiseRef) {
    private val k = ref.labels.length
    private val joint = Array.ofDim[Long](k, k) // [given][pred]
    private val abstain = new Array[Long](k)
    private var unknown = 0L
    private var rows = 0L
    private var lastFolded = -1L

    def fold(batch: DataFrame, batchId: Long): NoiseSnapshot = {
      if (batchId > lastFolded) {
        lastFolded = batchId
        import batch.sparkSession.implicits._
        val r = ref
        batch.select(col("label"), col("embedding"))
          .as[(Int, Array[Float])]
          .map { case (given, emb) => (given, NoiseStreams.scoreOne(r, emb)) }
          .groupBy(col("_1"), col("_2")).agg(count(lit(1)).as("n"))
          .collect().foreach { row =>
            val n = row.getLong(2)
            rows += n
            ref.idxOf.get(row.getInt(0)) match {
              case None => unknown += n
              case Some(g) =>
                val pred = row.getInt(1)
                if (pred < 0) abstain(g) += n
                else joint(g)(ref.idxOf(pred)) += n
            }
          }
      }
      snapshot()
    }

    private def snapshot(): NoiseSnapshot = {
      val nConf = Array.tabulate(k)(g => joint(g).sum)
      val nVecs = Array.tabulate(k)(g => nConf(g) + abstain(g))
      val nNoise = Array.tabulate(k)(g =>
        nConf(g) - joint(g)(g))
      NoiseSnapshot(rows, unknown, ref.labels.toSeq, nVecs.toSeq,
        nConf.toSeq, nNoise.toSeq)
    }
  }

  /** Start the monitor over a streaming labeled-embedding frame
    * (needs `label` int and `embedding` array<float> columns).
    * `onSnapshot(snapshot, batchId)` fires after every micro-batch
    * with the running joint; see the class scaladoc for the scale,
    * replay, and restart contracts. */
  def monitor(feed: DataFrame, ref: NoiseRef,
      onSnapshot: (NoiseSnapshot, Long) => Unit): StreamingQuery = {
    val fold = new NoiseFold(ref)
    feed.select(col("label"), col("embedding")).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onSnapshot(fold.fold(batch, batchId), batchId)
      }
      .start()
  }
}
