package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming TOMBSTONE MONITOR — q139's deletion-propagation audit as
  * takedown requests arrive: each micro-batch of deletion ids folds
  * into the accumulated tombstone set, and the batch emits the running
  * blast-radius report (docs, clusters touched/handoffs/dissolutions,
  * chunks, vectors, shard cells) against the FROZEN corpus artifacts —
  * the compliance dashboard that answers "what must we rewrite so
  * far?" while the takedown list is still streaming in, not at the
  * next full batch audit. The report is computed by the literal batch
  * code path ([[Dedup.deletionCascadeOver]]), so monitor and audit
  * cannot diverge — after any prefix of batches the emitted report
  * equals batch q139 run on everything received (spec-pinned).
  *
  * STATE IS THE EXACT ID SET, BY NECESSITY: compliance deletion is the
  * one place a membership sketch is wrong in BOTH directions (a false
  * positive deletes someone else's document; any miss is a violation),
  * so unlike [[NoveltyStreams]]' Bloom state this monitor keeps the
  * exact tombstone frame — takedown-list-sized, orders of magnitude
  * smaller than the corpus — as self-contained `localCheckpoint`
  * generations ([[DedupStreams.RefreshingIndex]]'s posture: every
  * generation eagerly materialized and lineage-free, so freeing an old
  * generation can never recompute through freed state).
  *
  * At-least-once: the union-distinct fold is idempotent, so a replayed
  * batch leaves both state and report unchanged — replay-idempotency
  * is spec-pinned.
  *
  * Scale posture: per batch — one distinct union of the id frame, one
  * cascade run whose deletion side is the broadcast tombstone set;
  * the cluster leg rides the memoized CC labels; nothing corpus-sized
  * reaches the driver.
  */
object TombstoneStreams {

  /** The accumulated tombstone set. Thread-confined to the streaming
    * micro-batch thread (one batch at a time by contract). */
  final class TombstoneSet(initial: DataFrame) {
    private var cur: DataFrame = initial.select(col("doc_id"))
      .distinct().localCheckpoint(true)

    def frame: DataFrame = cur

    private[streaming] def fold(ids: DataFrame): DataFrame = {
      val prev = cur
      cur = prev.union(ids.select(col("doc_id"))).distinct()
        .localCheckpoint(true)
      prev.unpersist()
      cur
    }
  }

  object TombstoneSet {
    def empty(spark: org.apache.spark.sql.SparkSession): TombstoneSet = {
      import spark.implicits._
      new TombstoneSet(Seq.empty[Long].toDF("doc_id"))
    }
  }

  /** Start the monitor over a streaming single-column `doc_id` frame
    * of deletion requests. Per batch, `onBatch` receives the running
    * q139-shaped cascade report for EVERYTHING received so far. */
  def monitor(requests: DataFrame, dir: String, state: TombstoneSet,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val spark = requests.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val writer = requests.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tombs = state.fold(batch)
        onBatch(Dedup.deletionCascadeOver(spark, dir, tombs), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
