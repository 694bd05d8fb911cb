package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.HeavyHitters
import graft.functions.TextFns.tokens

/** STREAMING heavy-hitter tracker — the stateful twin of batch q99's
  * sketch pass: per source, a Misra–Gries summary lives in stream state
  * and each micro-batch's tokens fold into it, emitting the updated
  * candidate set (the "what dominates this feed so far" monitor a
  * crawl-ingest dashboard polls).
  *
  * State is BOUNDED BY CONSTRUCTION: ≤ k−1 counters plus one total per
  * source, forever, regardless of stream length or vocabulary — the
  * property that makes a frequency monitor deployable on an unbounded
  * token stream at all (exact per-token state would grow with the
  * vocabulary; at crawl scale that is the stream itself).
  *
  * Correctness across batches: the per-batch fold IS Misra–Gries over
  * the batch, and folding into the retained state is the mergeable-
  * summaries merge — so after any number of micro-batches, any token
  * with total frequency > n/k over EVERYTHING seen is guaranteed
  * present in the candidate set (spec-pinned against an exact count
  * over the union of all batches). Candidate sets at the n/k margin
  * are arrival-order-dependent, exactly as in batch; a deployment
  * wanting the exact φ-set runs q99's exact second pass over the
  * candidates (batch-side, tiny).
  *
  * Scale posture: tokens shuffle once, keyed by source, into the
  * stateful operator; snapshots are one row per source per batch. */
object HeavyHitterStreams {

  final case class HHState(counts: Map[String, Long], n: Long)
  final case class HHSnapshot(source: String, candidates: Seq[String],
      n_tokens: Long)

  /** Per-source candidate snapshots, updated every micro-batch (use
    * with `outputMode("update")`). `docs` needs (source, text). */
  def heavyHitters(docs: DataFrame, k: Int): Dataset[HHSnapshot] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"), explode(tokens(col("text"))).as("w"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[HHState, HHSnapshot](GroupStateTimeout.NoTimeout()) {
        (src, rows, state) => advance(k, src, rows, state)
      }
  }

  /** Pure state transition, shared with the spec: fold the batch into
    * a fresh Misra–Gries buffer, merge the retained summary INTO it
    * (merge is symmetric on the counter algebra), snapshot. */
  private[streaming] def advance(k: Int, src: String,
      rows: Iterator[(String, String)],
      state: GroupState[HHState]): HHSnapshot = {
    val buf = new HeavyHitters.Buf(k)
    var seen = 0L
    rows.foreach { case (_, w) => buf.add(w); seen += 1 }
    state.getOption.foreach { s =>
      val prev = new HeavyHitters.Buf(k)
      s.counts.foreach { case (w, c) => prev.counts.put(w, c) }
      buf.mergeWith(prev)
    }
    val n = state.getOption.map(_.n).getOrElse(0L) + seen
    state.update(HHState(buf.counts.toMap, n))
    HHSnapshot(src, buf.counts.keysIterator.toSeq.sorted, n)
  }
}
