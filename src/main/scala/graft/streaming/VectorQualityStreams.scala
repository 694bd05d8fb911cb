package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** STREAMING vector-quality monitor — the ingest-time twin of batch
  * q238's embedding-quality audit: per label, the running vector
  * count, zero-vector count, and exact int64 norm statistics live in
  * stream state, and every micro-batch emits the label's updated
  * quality row. The deployment shape: embeddings arrive from the
  * encoder fleet as a stream, and a zero-vector burst (a crashed
  * encoder shard returning empty activations) or a norm-range blowout
  * (a scaling regression) must page BEFORE the nightly batch audit
  * runs.
  *
  * State is BOUNDED BY CONSTRUCTION: five int64s per label, forever —
  * and n/zero/min/max/avg are PREFIX-EXACT, so after any number of
  * micro-batches those five columns are bit-identical to batch q238
  * over everything seen (`VectorQualityStreamsSpec` pins the equality
  * at every batch boundary). The outlier legs (q238's n_norm_low/high
  * against the label's FINAL mean) are inherently two-pass and stay
  * batch-side; the stream's min/max band is the alarm that fires on
  * the same regressions one batch earlier.
  *
  * Scale posture: vectors shuffle once, keyed by label, into the
  * stateful operator; snapshots are one row per label per batch. */
object VectorQualityStreams {

  final case class QualityState(n: Long, sumN2: Long, nZero: Long,
      minN2: Long, maxN2: Long)
  final case class QualitySnapshot(label: Int, n_vecs: Long, n_zero: Long,
      min_n2: Long, max_n2: Long, avg_n2: Long)

  /** q238's exact scaled squared norm: floor(x·10⁴) per component,
    * int64 self-dot. */
  def n2Of(v: Array[Float]): Long = {
    val sv = DriftStreams.scale(v)
    var s = 0L; var i = 0
    while (i < sv.length) { s += sv(i) * sv(i); i += 1 }
    s
  }

  /** Per-label quality snapshots, updated every micro-batch (use with
    * `outputMode("update")`). `vectors` needs (label, embedding). */
  def quality(vectors: DataFrame): Dataset[QualitySnapshot] = {
    import vectors.sparkSession.implicits._
    vectors.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapGroupsWithState[QualityState, QualitySnapshot](
        GroupStateTimeout.NoTimeout()) { (label, rows, state) =>
        advance(label, rows, state)
      }
  }

  /** Pure state transition, shared with the spec. */
  private[streaming] def advance(label: Int,
      rows: Iterator[(Int, Array[Float])],
      state: GroupState[QualityState]): QualitySnapshot = {
    var s = state.getOption.getOrElse(
      QualityState(0L, 0L, 0L, Long.MaxValue, Long.MinValue))
    rows.foreach { case (_, v) =>
      val n2 = n2Of(v)
      s = QualityState(s.n + 1, s.sumN2 + n2,
        s.nZero + (if (n2 == 0L) 1L else 0L),
        math.min(s.minN2, n2), math.max(s.maxN2, n2))
    }
    state.update(s)
    // avg via floorDiv — `sum_n2 div n_vecs` on non-negative int64s,
    // batch q238's exact expression.
    QualitySnapshot(label, s.n, s.nZero, s.minN2, s.maxN2,
      Math.floorDiv(s.sumN2, s.n))
  }
}
