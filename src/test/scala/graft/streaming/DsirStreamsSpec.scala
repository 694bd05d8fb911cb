package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.TextAnalysis

/** Stream/batch parity for the DSIR selection gate: the MemoryStream-
  * driven [[DsirStreams.selectionGate]] must produce exactly batch
  * q107's weights and decisions on the same corpus + frozen lr table,
  * across micro-batches (scoring is stateless given the artifact, so
  * batch boundaries must not matter), and the artifact must stay
  * FROZEN — an off-target flood arriving as its own batch is still
  * rejected, because the estimator never retrains on the stream.
  */
class DsirStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("MemoryStream selection equals batch q107 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val docs = graft.Tables.documents(spark, dir)
    val lr = TextAnalysis.dsirLrTable(spark, dir)

    val rows = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    var batches = 0
    val q = DsirStreams.selectionGate(memDocs, lr, (scored, _) =>
      collected.synchronized {
        collected ++= scored
          .select("doc_id", "n_grams", "weight_u", "decision")
          .as[(Long, Long, Long, String)].collect()
        batches += 1
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    batches should be > 1
    val batch = SparkEntry.queries("q107_dsir_weights")(spark, dir)
      .select("doc_id", "n_grams", "weight_u", "decision")
      .as[(Long, Long, Long, String)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // no doc scored twice
  }

  test("the artifact stays frozen: an off-target flood arriving as its " +
      "own micro-batch is still rejected, an on-target doc selected") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // train the frozen artifact on the sf0.1 corpus: DSIR's estimator
    // needs a real target sample — at the smaller SFs the target is 25
    // docs and the per-bucket log-ratios are sampling noise, so junk
    // hitting a few lucky buckets can clear the evidence margin; the
    // 250-doc target tightens the bucket estimates and the margin holds
    val dir = "/root/testdata/sf0.1"
    val lr = TextAnalysis.dsirLrTable(spark, dir)
    // an exemplar the BATCH scorer selects (the strongest target-affine
    // doc): if the gate retrained on the stream, the junk flood before
    // it would shift the model and change this doc's decision; frozen,
    // the stream must reproduce the batch decision exactly
    val exemplar = SparkEntry.queries("q107_dsir_weights")(spark, dir)
      .filter($"decision" === "selected")
      .orderBy($"avg_u".desc)
      .select("doc_id").as[Long].head()
    val exemplarText = graft.Tables.documents(spark, dir)
      .filter($"doc_id" === exemplar)
      .select("text").as[String].head()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val out = scala.collection.mutable.Map.empty[Long, String]
    val q = DsirStreams.selectionGate(memDocs, lr, (d, _) =>
      out.synchronized {
        d.select("doc_id", "decision").as[(Long, String)]
          .collect().foreach { case (id, dec) => out(id) = dec }
      })
    try {
      // batch 1: a flood of pure off-vocabulary junk (100 tokens each:
      // a short gibberish doc's 29-gram mean can drift a couple of
      // lucky buckets above zero; at 99 grams the no-evidence mean
      // concentrates well under the selection margin)
      mem.addData((0 until 20).map(i =>
        (1000L + i, (0 until 100).map(j => s"qq${i}z$j").mkString(" "),
          "en", "crawl", 100L)))
      q.processAllAvailable()
      // batch 2: the batch-selected document arriving from a crawl
      // source AFTER the flood — the frozen artifact must still select
      mem.addData(Seq((2000L, exemplarText, "en", "crawl", 100L)))
      q.processAllAvailable()
    } finally q.stop()

    (0 until 20).foreach { i => out(1000L + i) shouldBe "rejected" }
    out(2000L) shouldBe "selected"
  }
}
