package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** STREAMING embedding-drift monitor — the stateful twin of batch
  * q100: per source, the running component sums of the scaled
  * embedding vectors live in stream state, and every micro-batch
  * emits the source's updated mean-direction cosine against a FROZEN
  * reference direction (the corpus global mean, computed batch-side
  * from the trusted corpus — the deployment shape: the reference is an
  * artifact of the last blessed corpus build, and the stream answers
  * "is this feed drifting away from it right now", per batch, without
  * re-scanning anything).
  *
  * State is BOUNDED BY CONSTRUCTION: 64 int64 sums plus one count per
  * source, forever, regardless of stream length — and the sums are
  * EXACT, so after any number of micro-batches the emitted drift is
  * bit-identical to batch q100's floor-mean cosine over everything
  * seen (spec-pinned at every batch boundary). Scaling, floor-mean
  * (`Math.floorDiv`, the floored division batch q100 spells
  * `(s − pmod(s,n))/n`), and the one-multiply-one-sqrt-one-divide
  * cosine all reuse the batch constants, so there is no
  * stream-vs-batch parity gap to audit.
  *
  * Scale posture: vectors shuffle once, keyed by source, into the
  * stateful operator; snapshots are one row per source per batch. */
object DriftStreams {

  final case class DriftState(n: Long, sums: Array[Long])
  final case class DriftSnapshot(source: String, n_vecs: Long, drift_u: Long)

  /** q100's fixed-point scaling: floor(x·10⁴) per component. */
  def scale(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 10000.0).toLong)

  /** Floor-mean direction + micro-unit cosine vs `ref` — the exact
    * arithmetic batch q100 runs, shared with the spec's batch replay. */
  def driftU(sums: Array[Long], n: Long, ref: Array[Long]): Long = {
    val m = sums.map(s => Math.floorDiv(s, n))
    var dot = 0L; var n2m = 0L; var n2r = 0L
    var i = 0
    while (i < m.length) {
      dot += m(i) * ref(i); n2m += m(i) * m(i); n2r += ref(i) * ref(i)
      i += 1
    }
    math.floor(1000000.0 * dot.toDouble /
      math.sqrt(n2m.toDouble * n2r.toDouble)).toLong
  }

  /** The frozen reference: the corpus global floor-mean direction,
    * computed batch-side from a trusted embeddings frame
    * (vec_id, embedding). A few hundred bytes — ships to every
    * executor as part of the closure. */
  def referenceMean(embeddings: DataFrame): Array[Long] = {
    import embeddings.sparkSession.implicits._
    val (n, sums) = embeddings.select(col("embedding"))
      .as[Array[Float]].rdd
      .map(v => (1L, scale(v)))
      .fold((0L, null: Array[Long])) { case ((na, a), (nb, b)) =>
        if (a == null) (nb, b)
        else if (b == null) (na, a)
        else (na + nb, Array.tabulate(a.length)(i => a(i) + b(i)))
      }
    require(n > 0L,
      "referenceMean: the trusted reference embeddings frame is empty — " +
        "a drift reference direction cannot be derived from zero vectors")
    sums.map(s => Math.floorDiv(s, n))
  }

  /** Per-source drift snapshots, updated every micro-batch (use with
    * `outputMode("update")`). `vectors` needs (source, embedding). */
  def drift(vectors: DataFrame, ref: Array[Long]): Dataset[DriftSnapshot] = {
    import vectors.sparkSession.implicits._
    vectors.select(col("source"), col("embedding"))
      .as[(String, Array[Float])]
      .groupByKey(_._1)
      .mapGroupsWithState[DriftState, DriftSnapshot](
        GroupStateTimeout.NoTimeout()) { (src, rows, state) =>
        advance(src, rows, ref, state)
      }
  }

  /** Pure state transition, shared with the spec: fold the batch's
    * scaled vectors into the retained exact sums, emit the running
    * drift. */
  private[streaming] def advance(src: String,
      rows: Iterator[(String, Array[Float])], ref: Array[Long],
      state: GroupState[DriftState]): DriftSnapshot = {
    val sums = state.getOption.map(_.sums.clone())
      .getOrElse(new Array[Long](ref.length))
    var n = state.getOption.map(_.n).getOrElse(0L)
    rows.foreach { case (_, v) =>
      val sv = scale(v)
      var i = 0
      while (i < sums.length) { sums(i) += sv(i); i += 1 }
      n += 1
    }
    state.update(DriftState(n, sums))
    DriftSnapshot(src, n, driftU(sums, n, ref))
  }
}
