package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Stream/batch parity and cross-batch state for the Bloom-backed
  * novelty monitor: a whole corpus streamed as one batch must reproduce
  * batch q122's per-source novelty exactly (at spec fpp the sketch
  * cannot false-positive), and content re-shipped in a LATER batch must
  * score zero novelty — the seen-state crossing batch boundaries — while
  * genuinely fresh content in the same batch scores full.
  */
class NoveltyStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def runBatches(
      batches: Seq[Seq[(Long, String, String)]],
      state: NoveltyStreams.SeenShingles)
      : Seq[(Long, String, Long, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Long)]
    val q = NoveltyStreams.monitor(docs, state, (report, id) =>
      collected.synchronized {
        collected ++= report
          .select("source", "n_shingles", "n_novel", "novelty_u")
          .as[(String, Long, Long, Long)].collect()
          .map(r => (id, r._1, r._2, r._3, r._4))
      })
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    collected.toSeq
  }

  test("one-batch stream reproduces batch q122's novelty exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("novstream_").toString
    val origA = "alpha beta gamma delta epsilon zeta eta theta"
    val origA2 = "iota kappa lambda mu nu xi omicron pi"
    val fresh = "rho sigma tau upsilon phi chi psi omega"
    val rows = Seq(
      (0L, origA, "a_first"), (1L, origA2, "a_first"),
      (2L, origA, "b_reseller"), (3L, origA2, "b_reseller"),
      (4L, fresh, "c_fresh"))
    rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val batch = SparkEntry.queries("q122_source_novelty")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val streamed = runBatches(Seq(rows),
        new NoveltyStreams.SeenShingles(fpp = 1e-9))
      .map(r => (r._2, r._3, r._4, r._5)).toSet
    streamed shouldBe batch
  }

  test("state crosses batches: re-shipped content scores zero novelty, " +
      "fresh content full") {
    val a = "one two three four five six seven eight nine"
    val b = "ten eleven twelve thirteen fourteen fifteen sixteen"
    val streamed = runBatches(Seq(
        Seq((0L, a, "src_orig")),
        Seq((1L, a, "src_late_copy"), (2L, b, "src_new"))),
      new NoveltyStreams.SeenShingles(fpp = 1e-9))

    val batch0 = streamed.filter(_._1 == 0L)
    batch0.map(_._2) shouldBe Seq("src_orig")
    batch0.head._5 shouldBe 1000000L // everything novel on first sight

    val batch1 = streamed.filter(_._1 == 1L)
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // the late copy re-ships batch-0 content: zero novel shingles
    batch1("src_late_copy")._2 shouldBe 0L
    batch1("src_late_copy")._3 shouldBe 0L
    // a fresh feed in the SAME batch still prices at full novelty
    batch1("src_new")._3 shouldBe 1000000L
  }

  test("a snapshot-restored state still recognizes previously-seen " +
      "content — the restart path is state-faithful") {
    val a = "red orange yellow green blue indigo violet ultraviolet"
    val first = new NoveltyStreams.SeenShingles(fpp = 1e-9)
    runBatches(Seq(Seq((0L, a, "src_orig"))), first)

    // restart: a NEW incarnation restored from the persisted snapshot
    val restored = NoveltyStreams.SeenShingles.fromSnapshot(first.snapshot)
    val replayed = runBatches(Seq(Seq((1L, a, "src_reseller"))), restored)
    replayed.map(r => (r._2, r._4, r._5)) shouldBe
      Seq(("src_reseller", 0L, 0L)) // nothing novel across the restart
  }
}
