package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.{Dedup, Similarity}

/** The tombstone monitor must be the batch q139 audit at every batch
  * boundary: over the planted handoff/dissolution corpus, streaming
  * the `% 23` deletion set in three micro-batches emits, per
  * boundary, exactly `deletionCascadeOver` of the accumulated prefix
  * — the final boundary equal to batch q139 itself — with the cascade
  * semantics visible mid-stream (a cluster reads as a HANDOFF while
  * its canonical is gone but members survive, then as DISSOLVED once
  * the last member's tombstone arrives), and a replayed batch (the
  * at-least-once case) changing nothing. */
class TombstoneStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private def doc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
      .mkString(" ")

  private def writeCorpus(dir: String): Unit = {
    import spark.implicits._
    val clusterA = Seq(0L, 5L, 7L).map(id => (id, doc(500)))
    val clusterB = Seq(23L, 46L).map(id => (id, doc(600)))
    val clusterC = Seq(3L, 69L).map(id => (id, doc(700)))
    val used = (clusterA ++ clusterB ++ clusterC).map(_._1).toSet
    val unique = (0L until 90L).filterNot(used)
      .filterNot(_ % 23 == 0).take(20).map(id => (id, doc(id.toInt)))
    (clusterA ++ clusterB ++ clusterC ++ unique).map { case (id, t) =>
      (id, t, "en", s"src${id % 2}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    (0L until 20L).map(i => (i, Array.fill(Similarity.Dim)(0.5f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def asTuple(r: org.apache.spark.sql.Row) =
    (0 until 7).map(r.getLong)

  test("per-boundary reports equal the batch cascade on the prefix; " +
      "final equals batch q139; replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("tomb_").toString
    writeCorpus(dir)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val state = TombstoneStreams.TombstoneSet.empty(spark)
    @volatile var latest: Seq[Long] = Nil
    val q = TombstoneStreams.monitor(mem.toDF().toDF("doc_id"), dir, state,
      (report, _) => latest = asTuple(report.collect().head))

    def batchOver(ids: Seq[Long]): Seq[Long] = {
      val f = ids.toDF("doc_id")
      asTuple(Dedup.deletionCascadeOver(spark, dir, f).collect().head)
    }

    try {
      // b0: 23 — cluster B's CANONICAL deleted, 46 survives ⇒ handoff.
      mem.addData(23L); q.processAllAvailable()
      latest shouldBe batchOver(Seq(23L))
      latest(1) shouldBe 1L // clusters touched
      latest(2) shouldBe 1L // handoff: B mid-deletion
      latest(3) shouldBe 0L

      // b1: 46 + 0 — B fully dissolved (handoff cleared), A in handoff.
      mem.addData(46L, 0L); q.processAllAvailable()
      latest shouldBe batchOver(Seq(23L, 46L, 0L))
      latest(2) shouldBe 1L // A only
      latest(3) shouldBe 1L // B dissolved

      // b2: 69 — C touched (non-canonical member); final == batch q139.
      mem.addData(69L); q.processAllAvailable()
      latest shouldBe batchOver(Seq(23L, 46L, 0L, 69L))
      val q139 = asTuple(
        SparkEntry.queries("q139_deletion_cascade")(spark, dir)
          .collect().head)
      latest shouldBe q139

      // replay: the same ids again — idempotent state, same report.
      mem.addData(23L, 46L, 0L, 69L); q.processAllAvailable()
      latest shouldBe q139
    } finally q.stop()
  }
}
