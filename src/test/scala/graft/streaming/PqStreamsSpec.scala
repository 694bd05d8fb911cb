package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.{Features, Similarity}

/** Stream/batch parity for the PQ index ingest: the fixture corpus
  * streamed in micro-batches against its own frozen codebook must (a)
  * emit per-batch code rows identical to the batch encode of that
  * slice, (b) end with an accumulated histogram equal to batch q135
  * cell-for-cell, and (c) ignore a replayed batchId (at-least-once
  * safety). */
class PqStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  test("streamed ingest converges to exactly batch q135's histogram, " +
      "with per-batch code rows equal to the batch encode of the slice") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val embs = mem.toDF().toDF("vec_id", "embedding")

    // Frozen codebook: the corpus build's own seeds.
    val codebook = Similarity.pqCodebook(
      Features.scaledEmb(spark, dir)).cache()

    val codesSeen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long)])]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Long, Long)]]
    val state = new PqStreams.PqCounts
    val q = PqStreams.encodeIngest(embs, codebook, state,
      (codes, report, id) => codesSeen.synchronized {
        codesSeen += id -> codes
          .select("vec_id", "s", "code", "d2")
          .as[(Long, Int, Long, Long)].collect()
          .map(t => (t._1, t._2.toLong, t._3, t._4)).toSet
        reports += report
          .as[(Long, Long, Long, Long)].collect().toSeq
      })
    val chunks = rows.grouped((rows.size + 2) / 3).toSeq
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    codesSeen.size shouldBe 3
    // (a) per-batch codes == batch encode of exactly that slice
    chunks.zip(codesSeen).foreach { case (chunk, (_, got)) =>
      val slice = chunk.toDF("vec_id", "embedding")
      val expect = Similarity.pqEncodeOver(
        Features.scaledEmbOver(slice), codebook)
        .as[(Long, Int, Long, Long)].collect()
        .map(t => (t._1, t._2.toLong, t._3, t._4)).toSet
      got shouldBe expect
    }
    // (b) final accumulated histogram == batch q135
    val batch = SparkEntry.queries("q135_pq_codes")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    reports.last.toSet shouldBe batch
    // every boundary: populations sum to the seen prefix × subspaces
    reports.zipWithIndex.foreach { case (rep, i) =>
      rep.map(_._3).sum shouldBe
        chunks.take(i + 1).map(_.size).sum.toLong * Similarity.PqSubspaces
    }
    // (c) replay safety: re-adding the last batchId is a no-op
    val before = state.snapshot
    state.add(before._1, Seq((0L, 0L) -> (999L, 999L))) shouldBe false
    state.snapshot shouldBe before
  }
}
