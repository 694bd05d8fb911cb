package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.pipeline.HashScorer

/** The streaming reservoir must be the batch q143 draw over everything
  * seen: at every batch boundary the k-row state equals an independent
  * reference reimplementation of the E-S keys on the fed prefix, the
  * final reservoir equals batch q143 on the same corpus id-for-id, and
  * a replayed batch leaves the reservoir unchanged. */
class SampleStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo")
  private def doc(seed: Int): String = // varying weights: 5..34 tokens
    (0 until (5 + seed % 30)).map(j => vocab((seed + j) % 5) + seed.toString)
      .mkString(" ")

  private def refKey(id: Long, w: Long): Double =
    math.log((HashScorer.md5u32(s"$id#wsample") + 1).toDouble / 4294967296.0) / w

  test("per-boundary reservoir equals the reference prefix draw; final " +
      "equals batch q143; replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("wres_").toString
    val rows = (0L until 60L).map(i => (i, doc(i.toInt), s"src${i % 3}"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val state = new SampleStreams.Reservoir(TextAnalysisK)
    @volatile var latest: Vector[SampleStreams.Draw] = Vector.empty
    val q = SampleStreams.reservoir(
      mem.toDF().toDF("doc_id", "text", "source"), state,
      (r, _) => latest = r)

    def refTop(prefix: Seq[(Long, String, String)]): Seq[Long] =
      prefix.map { case (id, t, _) =>
        (id, refKey(id, t.split(" ").length.toLong))
      }.sortBy { case (id, k) => (-k, id) }.take(TextAnalysisK).map(_._1)

    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    try {
      rows.grouped(20).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        latest.map(_._1) shouldBe refTop(fed.toSeq)
      }
      // final == batch q143 on the same corpus (ids in draw order)
      val batchIds = SparkEntry.queries("q143_weighted_sample")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      latest.map(_._1).toSet shouldBe batchIds
      // replay: re-offer everything — deterministic keys, no change
      val before = latest
      mem.addData(rows)
      q.processAllAvailable()
      latest shouldBe before
    } finally q.stop()
  }

  private def TextAnalysisK = graft.operators.TextAnalysis.SampleK
}
