package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The source seam: a gate must run UNCHANGED over (a) the file-shaped
  * documents stream and (b) a stream wearing EXACTLY the columns
  * Spark's Kafka reader emits, adapted by
  * [[StreamSources.documentsFromKafkaWire]] — same decisions, same
  * rows. An unparseable payload fails the batch loudly with its
  * topic/partition/offset, never a silent drop. */
class KafkaSeamSpec extends AnyFunSuite with SparkSpec with Matchers {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def jsonOf(id: Long, text: String, source: String): String =
    s"""{"doc_id":$id,"text":"$text","lang":"en","source":"$source",""" +
      s""""n_chars":${text.length}}"""

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps " +
      "going with enough words to clear the floor rules today", "srcA"),
    (2L, "buy buy buy buy buy buy buy buy buy buy buy buy", "srcB"),
    (3L, "x", "srcC"))

  test("the gopher gate's decisions over the Kafka-wire adapter equal " +
      "its decisions over the file-shaped stream, row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def collectFlags(feed: org.apache.spark.sql.DataFrame)
        : Map[Long, Seq[Any]] = {
      val out = scala.collection.mutable.Map.empty[Long, Seq[Any]]
      val q = QualityStreams.gopherGate(feed, (batch, _) =>
        batch.collect().foreach(r =>
          out.synchronized { out(r.getLong(0)) = r.toSeq.drop(1) }))
      try q.processAllAvailable() finally q.stop()
      out.toMap
    }

    // (a) the file-shaped stream: documents columns directly
    val direct = MemoryStream[(Long, String, String, String, Long)]
    direct.addData(docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) })
    val directFlags = collectFlags(
      direct.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))

    // (b) the SAME rows on the Kafka wire: key/value binary + provenance
    val wire = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    wire.addData(docs.zipWithIndex.map { case ((id, t, s), i) =>
      (s"k$id".getBytes("UTF-8"), jsonOf(id, t, s).getBytes("UTF-8"),
        "docs", 0, i.toLong)
    })
    val kafkaFlags = collectFlags(StreamSources.documentsFromKafkaWire(
      wire.toDF().toDF("key", "value", "topic", "partition", "offset")))

    directFlags.keySet shouldBe Set(1L, 2L, 3L)
    kafkaFlags shouldBe directFlags
  }

  test("an unparseable payload fails the batch LOUDLY with its " +
      "topic/partition/offset — never a silent drop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wire = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    wire.addData(Seq((Array.empty[Byte],
      "not json at all".getBytes("UTF-8"), "docs", 3, 42L)))
    var failed: Option[Throwable] = None
    val q = QualityStreams.gopherGate(
      StreamSources.documentsFromKafkaWire(
        wire.toDF().toDF("key", "value", "topic", "partition", "offset")),
      (batch, _) => batch.collect())
    try {
      val e = intercept[Exception] { q.processAllAvailable() }
      failed = Some(e)
    } finally q.stop()
    val msgs = Iterator.iterate(failed.get: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    msgs should include("unparseable payload")
    msgs should include("docs/3:42")
  }
}
