package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Stream/batch parity for the threshold-curve monitor: the fixture
  * embeddings streamed in micro-batches must emit, AT EVERY BATCH
  * BOUNDARY, exactly batch q251's curve over the seen prefix — every
  * unordered same-bucket pair has one "new" end, so summed per-batch
  * increments equal the one-shot histogram (int64, no approximation).
  */
class ThresholdCurveStreamsSpec extends AnyFunSuite with SparkSpec
    with Matchers {

  private val dir = SparkSpec.Sf0001

  private def batchCurve(prefix: Seq[(Long, Seq[Float], Int)])
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_curve_")
    tmp.toFile.deleteOnExit()
    prefix.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(tmp.resolve("embeddings.parquet").toString)
    SparkEntry.queries("q251_threshold_curve")(spark, tmp.toString)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("streamed corpus emits exactly batch q251's curve over the " +
      "seen prefix at every boundary") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val embs = mem.toDF().toDF("vec_id", "embedding", "label")

    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long, Long)])]
    val q = ThresholdCurveStreams.thresholdCurveMonitor(embs,
      new ThresholdCurveStreams.BandCounts,
      new ThresholdCurveStreams.StandingVectors(spark),
      (report, id) => perBatch.synchronized {
        perBatch += id -> report
          .select("band", "thr_u", "n_pairs", "n_admitted", "admit_frac_u")
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      })
    val chunks = rows.grouped((rows.size + 2) / 3).toSeq
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    perBatch.size shouldBe 3
    perBatch.zipWithIndex.foreach { case ((_, got), i) =>
      withClue(s"boundary $i: ") {
        got shouldBe batchCurve(chunks.take(i + 1).flatten)
      }
    }
  }

  test("a restored snapshot continues the curve exactly (restart " +
      "fidelity for the band counters)") {
    val bc = new ThresholdCurveStreams.BandCounts
    bc.add(0L, Seq(10L -> 5L, 12L -> 2L)) shouldBe true
    bc.add(0L, Seq(10L -> 99L)) shouldBe false // replay: ignored
    val restored = ThresholdCurveStreams.BandCounts.restore(bc.snapshot)
    restored.add(0L, Seq(10L -> 99L)) shouldBe false // still final
    restored.add(1L, Seq(10L -> 1L)) shouldBe true
    restored.snapshot._2.toMap shouldBe Map(10L -> 6L, 12L -> 2L)
  }
}
