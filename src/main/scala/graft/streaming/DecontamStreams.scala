package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Similarity}

/** Streaming DECONTAMINATION GATE — benchmark hygiene at ingest: each
  * micro-batch of incoming documents is checked against the frozen eval
  * artifacts and flagged before it can enter the training corpus. Three
  * legs, the same three the batch pipeline runs:
  *
  *  - the N-GRAM leg (batch q73): the batch's word-3-gram postings join
  *    the broadcast hashed-shingle postings of the benchmark slice —
  *    any shared shingle is a verbatim-overlap hit
  *    (`/root/reference` ships no decontamination; this is the standard
  *    GPT-2/GPT-3-era n-gram overlap gate);
  *  - the SPAN leg (batch q118): the batch's 8-word window hashes join
  *    the broadcast eval window artifact — the long-verbatim gate whose
  *    hits are essentially never coincidence (the GPT-3/PaLM-era
  *    long-n-gram form);
  *  - the EMBEDDING leg (batch q105): the batch's vectors, scaled and
  *    sign-LSH-bucketed exactly as the batch path does, join the
  *    broadcast eval vectors within shared buckets — the paraphrase
  *    leak n-grams cannot see.
  *
  * Both eval artifacts are FROZEN static side inputs, never re-derived
  * from the stream — the same ship-the-model posture as
  * [[QualityStreams]]' LM and [[DsirStreams]]' log-ratio table: a
  * benchmark is a fixed, versioned set, so its postings/vectors are
  * built once (or loaded from the benchmark release) and broadcast to
  * every batch.
  *
  * Stream/batch parity by construction: the scorers are literally the
  * batch code paths ([[Dedup.contamScoresOver]],
  * [[Similarity.semContamOver]]) applied per micro-batch via
  * `foreachBatch` (`DecontamStreamsSpec` pins flag equality against
  * batch q73/q105 on the same corpus across MemoryStream micro-batch
  * splits). Scoring is stateless per document given the artifacts — no
  * cross-batch state, so batch boundaries cannot change decisions and
  * replay is naturally idempotent.
  *
  * Scale posture: per micro-batch cost is one shingle explode + one
  * broadcast join (n-gram leg) and one scale + one bucket-keyed
  * broadcast join (embedding leg) — no stream-side shuffle beyond the
  * per-doc aggregates, no state store. This is the first gate a
  * crawl-ingest pipeline runs, so it must keep up with raw crawl rate:
  * everything here is embarrassingly parallel.
  */
object DecontamStreams {

  /** n-gram decontamination gate (streaming twin of batch q73): scores
    * each micro-batch of `(doc_id, text, …)` rows against the frozen
    * eval postings and emits q73's per-doc score frame
    * `(doc_id, n_hits, n_shingles, ratio_u, min_eval_doc)` — only docs
    * with at least one hit appear, exactly like the batch report.
    *
    * @param docs         streaming DataFrame carrying doc_id + text
    * @param evalPostings STATIC frozen `(e_id, h)` postings of the
    *                     benchmark slice (see [[Dedup.evalPostings]])
    * @param onBatch      receives the score frame + batchId per batch
    * @param checkpoint   optional checkpoint dir for restartable offsets
    */
  def ngramGate(docs: DataFrame, evalPostings: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery =
    gate(docs, onBatch, checkpoint) { batch =>
      Dedup.contamScoresOver(Dedup.hashedShinglesOver(batch), evalPostings)
    }

  /** Embedding decontamination gate (streaming twin of batch q105):
    * scores each micro-batch of `(vec_id, embedding, …)` rows against
    * the frozen eval vectors and emits q105's per-vector score frame
    * `(vec_id, n_hits, max_cos_u, closest_eval)`.
    *
    * @param embs     streaming DataFrame carrying vec_id + embedding
    * @param evalVecs STATIC frozen scaled+bucketed eval vectors
    *                 `(e_id, e_sv, e_n2, bkt)` (see
    *                 [[Similarity.semContamEvalVecs]])
    * @param bits     sign-LSH width — must match the width the eval
    *                 artifact was bucketed with
    */
  def embeddingGate(embs: DataFrame, evalVecs: DataFrame,
      bits: Int = Similarity.DefaultLshBits,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery =
    gate(embs, onBatch, checkpoint) { batch =>
      Similarity.semContamScoresOver(batch, evalVecs, bits)
    }

  /** Exact-substring span gate (streaming twin of batch q118): each
    * micro-batch's [[graft.operators.Dedup.SpanK]]-word windows are
    * checked against the frozen eval window-hash artifact and q118's
    * per-doc score frame `(doc_id, n_hit_windows, n_windows,
    * hit_frac_u, n_hit_occurrences, min_eval_doc)` is emitted — the
    * long-window verbatim leg whose hits are essentially never
    * coincidence (q73's 3-gram leg fires on common phrases too).
    *
    * @param docs     streaming DataFrame carrying doc_id + text
    * @param evalWins STATIC frozen `(h, min_eval_doc)` window hashes of
    *                 the benchmark slice (see
    *                 [[graft.operators.Dedup.evalSpanWindows]]) */
  def spanGate(docs: DataFrame, evalWins: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery =
    gate(docs, onBatch, checkpoint) { batch =>
      Dedup.spanScoresOver(batch, evalWins)
    }

  /** Combined gate: rows carrying BOTH text and embedding get a single
    * per-doc decision frame `(doc_id, ngram_hits, span_hits, sem_hits,
    * contaminated)` — one row per INCOMING doc (clean docs appear with
    * zero hits), which is what an ingest router needs: every doc gets a
    * verdict, contaminated ones are quarantined, the rest flow on. All
    * three verbatim/semantic legs run against their frozen artifacts. */
  def combinedGate(rows: DataFrame, evalPostings: DataFrame,
      evalVecs: DataFrame, evalSpanWins: DataFrame,
      bits: Int = Similarity.DefaultLshBits,
      onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String] = None): StreamingQuery =
    gate(rows, onBatch, checkpoint) { batch =>
      val ngram = Dedup.contamScoresOver(
          Dedup.hashedShinglesOver(batch), evalPostings)
        .select(col("doc_id"), col("n_hits").as("ngram_hits"))
      val span = Dedup.spanScoresOver(batch, evalSpanWins)
        .select(col("doc_id"), col("n_hit_windows").as("span_hits"))
      val sem = Similarity.semContamScoresOver(
          batch.select(col("doc_id").as("vec_id"), col("embedding")),
          evalVecs, bits)
        .select(col("vec_id").as("doc_id"), col("n_hits").as("sem_hits"))
      batch.select(col("doc_id"))
        .join(ngram, Seq("doc_id"), "left")
        .join(span, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("ngram_hits"), lit(0L)).as("ngram_hits"),
          coalesce(col("span_hits"), lit(0L)).as("span_hits"),
          coalesce(col("sem_hits"), lit(0L)).as("sem_hits"))
        .withColumn("contaminated",
          col("ngram_hits") > 0L || col("span_hits") > 0L ||
            col("sem_hits") > 0L)
    }

  private def gate(src: DataFrame, onBatch: (DataFrame, Long) => Unit,
      checkpoint: Option[String])(
      score: DataFrame => DataFrame): StreamingQuery = {
    val writer = src.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(score(batch), batchId)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }
}
