package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{ManifestWriter, SparkSpec}

/** The streaming snapshot-delta monitor: classification against the
  * FROZEN stored ledger must agree with the batch ledgerDelta on the
  * same documents (minus the structurally-stream-invisible `removed`
  * class), redeliveries must re-classify identically in later batches
  * (stateless at-least-once contract), and char deltas must be exact
  * per class. */
class DeltaStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def runBatches(ledgerDir: String,
      batches: Seq[Seq[(Long, String, String)]])
      : Seq[(Long, String, String, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    val collected = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, Long, Long)]
    val q = DeltaStreams.monitor(docs,
      ManifestWriter.read(spark, ledgerDir),
      (report, id) => collected.synchronized {
        collected ++= report
          .as[(String, String, Long, Long)].collect()
          .map(r => (id, r._1, r._2, r._3, r._4))
      })
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    collected.toSeq
  }

  private def writeLedgerOf(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("dstream_led_").toString + "/ledger"
    ManifestWriter.writeLedger(
      rows.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir)
    dir
  }

  test("stream classification equals batch ledgerDelta minus `removed`, " +
      "char deltas exact") {
    import spark.implicits._
    // stored: docs 1 (will arrive unchanged), 2 (will arrive changed),
    // 9 (never arrives — removed is invisible to the stream)
    val ledgerDir = writeLedgerOf(Seq(
      (1L, "sA", "alpha text"), (2L, "sA", "beta text OLD"),
      (9L, "sB", "long gone")))
    // live arrivals: 1 unchanged, 2 changed (9 vs 13 chars), 3 added
    val live = Seq(
      (1L, "alpha text", "sA"), (2L, "beta text", "sA"),
      (3L, "gamma text", "sB"))

    val got = runBatches(ledgerDir, Seq(live))
      .map { case (_, src, status, n, d) => (src, status) -> ((n, d)) }
      .toMap
    got shouldBe Map(
      ("sA", "unchanged") -> ((1L, 0L)),
      ("sA", "changed") -> ((1L, -4L)),
      ("sB", "added") -> ((1L, 10L)))

    // batch q159-shape delta on the same docs: identical rows plus the
    // one class a stream cannot see
    val batch = graft.operators.TextAnalysis.ledgerDelta(
      graft.operators.TextAnalysis.docLedgerOf(
        live.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")),
      ManifestWriter.read(spark, ledgerDir))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    batch.view.filterKeys(_._2 != "removed").toMap shouldBe got
    batch(("sB", "removed")) shouldBe ((1L, -9L))
  }

  test("redeliveries in a later batch re-classify identically: the " +
      "monitor is stateless against the frozen ledger") {
    val ledgerDir = writeLedgerOf(Seq((1L, "sA", "alpha text")))
    val batch1 = Seq((1L, "alpha text", "sA"), (5L, "fresh text", "sA"))
    val got = runBatches(ledgerDir, Seq(batch1, batch1))
      .groupBy(_._1).view
      .mapValues(_.map { case (_, s, st, n, d) => (s, st, n, d) }.toSet)
      .toMap
    got(0L) shouldBe got(1L) // bit-identical report per replayed batch
    got(0L) shouldBe Set(
      ("sA", "unchanged", 1L, 0L),
      ("sA", "added", 1L, 10L))
  }
}
