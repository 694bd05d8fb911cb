package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.pipeline.CentroidModel

/** Streaming centroid training: the emitted model must be BYTE-
  * identical to batch `CentroidModel.train` over everything seen at
  * every batch boundary (the monoid claim), no model may be emitted
  * while the cumulative class set has a gap (batch training's own
  * contiguity contract), and a replayed batch id must fold nothing
  * (sums are not idempotent — replay protection is correctness). */
class TrainStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = 16

  /** Deterministic pseudo-feature vector for (class, i): class bands
    * with per-row jitter, any values work — the monoid is exact. */
  private def feat(cls: Int, i: Int): Array[Float] =
    Array.tabulate(Dim)(d =>
      (if (d == cls % Dim) 0.7f else 0.02f) + ((i * 7 + d) % 5) * 0.003f)

  private def bytesOf(m: CentroidModel): Seq[Byte] = {
    val p = Files.createTempFile("tstream_", ".gcm")
    Files.delete(p)
    m.save(p.toString)
    try Files.readAllBytes(p).toSeq finally Files.delete(p)
  }

  private def toDF(rows: Seq[(Int, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("label_idx", "features")
  }

  test("every emitted model is byte-identical to batch training on the " +
      "prefix; a class gap suppresses emission until it closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, Array[Float])]
    val labeled = mem.toDF().toDF("label_idx", "features")

    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, CentroidModel)]
    val q = TrainStreams.monitor(labeled,
      (m, id) => emitted.synchronized { emitted += ((id, m)) }, Dim)

    // batch 0: classes {0, 2} — gap at 1 ⇒ nothing servable yet
    val b0 = Seq((0, feat(0, 0)), (0, feat(0, 1)), (2, feat(2, 0)))
    // batch 1: class 1 arrives ⇒ first model, over b0 ++ b1
    val b1 = Seq((1, feat(1, 0)), (1, feat(1, 1)), (2, feat(2, 1)))
    // batch 2: growth everywhere ⇒ updated model over the full prefix
    val b2 = Seq((0, feat(0, 2)), (1, feat(1, 2)), (2, feat(2, 2)))
    try {
      Seq(b0, b1, b2).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    emitted.map(_._1) shouldBe Seq(1L, 2L) // batch 0 emitted nothing
    bytesOf(emitted(0)._2) shouldBe
      bytesOf(CentroidModel.train(toDF(b0 ++ b1), Dim))
    bytesOf(emitted(1)._2) shouldBe
      bytesOf(CentroidModel.train(toDF(b0 ++ b1 ++ b2), Dim))
  }

  test("a replayed batch id folds nothing: the model after the replay " +
      "equals the model before it (sums are not idempotent)") {
    val fold = new TrainStreams.TrainFold(Dim)
    val b0 = toDF(Seq((0, feat(0, 0)), (1, feat(1, 0))))
    val b1 = toDF(Seq((0, feat(0, 1)), (1, feat(1, 1))))

    fold.fold(b0, 0L) should not be empty
    val after1 = fold.fold(b1, 1L).get
    // at-least-once redelivery of batch 1: strict no-op
    val afterReplay = fold.fold(b1, 1L).get
    bytesOf(afterReplay) shouldBe bytesOf(after1)
    // and equal to batch training over the true prefix
    bytesOf(after1) shouldBe bytesOf(
      CentroidModel.train(toDF(Seq((0, feat(0, 0)), (1, feat(1, 0)),
        (0, feat(0, 1)), (1, feat(1, 1)))), Dim))
    // a genuinely new batch still folds
    val b2 = toDF(Seq((0, feat(0, 2)), (1, feat(1, 2))))
    bytesOf(fold.fold(b2, 2L).get) should not be bytesOf(after1)
  }
}
