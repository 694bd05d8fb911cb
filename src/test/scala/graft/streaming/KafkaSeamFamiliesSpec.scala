package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** The Kafka seam, widened across EVERY gate family (round-12 verdict
  * task 5): `KafkaSeamSpec` proved the wire-shape contract for the
  * gopher gate; these specs pin, per family, that the gate's decision
  * rows over [[StreamSources.documentsFromKafkaWire]] /
  * [[StreamSources.embeddingsFromKafkaWire]] are IDENTICAL to its
  * decisions over a file-shaped stream carrying the same rows — so a
  * production deployment swaps sources without revalidating a single
  * gate. Payloads are built with Spark's own `to_json` over the real
  * sf0.001 rows (quotes, unicode, float arrays — whatever the corpus
  * holds rides the wire, not a sanitized fixture).
  */
class KafkaSeamFamiliesSpec extends AnyFunSuite with SparkSpec with Matchers {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val Dir = SparkSpec.Sf0001

  /** First 24 documents — includes eval-slice ids (doc_id % mod == 0)
    * so the decontamination legs score real hits, and even ids so the
    * dedup gate sees true corpus duplicates. */
  private lazy val docRows: Seq[(Long, String, String, String, Long)] =
    graft.Tables.documents(spark, Dir)
      .orderBy(col("doc_id")).limit(24).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  private lazy val embRows: Seq[(Long, Seq[Float], Int)] =
    graft.Tables.embeddings(spark, Dir)
      .orderBy(col("vec_id")).limit(24).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))

  private def wireOf(payloads: Seq[String]): DataFrame = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    ms.addData(payloads.zipWithIndex.map { case (p, i) =>
      (Array.empty[Byte], p.getBytes("UTF-8"), "feed", 0, i.toLong)
    })
    ms.toDF().toDF("key", "value", "topic", "partition", "offset")
  }

  /** (file-shaped feed, wire-adapted feed) carrying the same doc rows. */
  private def docFeeds(): (DataFrame, DataFrame) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val direct = MemoryStream[(Long, String, String, String, Long)]
    direct.addData(docRows)
    val payloads = docRows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("v"))
      .collect().map(_.getString(0)).toSeq
    (direct.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      StreamSources.documentsFromKafkaWire(wireOf(payloads)))
  }

  private def embFeeds(): (DataFrame, DataFrame) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val direct = MemoryStream[(Long, Seq[Float], Int)]
    direct.addData(embRows)
    val payloads = embRows
      .toDF("vec_id", "embedding", "label")
      .select(to_json(struct(col("vec_id"), col("embedding"),
        col("label"))).as("v"))
      .collect().map(_.getString(0)).toSeq
    (direct.toDF().toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>")),
      StreamSources.embeddingsFromKafkaWire(wireOf(payloads)))
  }

  /** Run one gate over a feed; decision rows keyed by the first (id)
    * column, values stringified for exact comparison. */
  private def runGate(feed: DataFrame)(
      start: (DataFrame, (DataFrame, Long) => Unit) => StreamingQuery)
      : Map[Long, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val q = start(feed, (batch, _) =>
      batch.collect().foreach { r =>
        out.synchronized { out(r.getLong(0)) = r.toSeq.map(String.valueOf) }
      })
    try q.processAllAvailable() finally q.stop()
    out.toMap
  }

  private def fileEqWire(mkFeeds: () => (DataFrame, DataFrame))(
      start: (DataFrame, (DataFrame, Long) => Unit) => StreamingQuery)
      : Map[Long, Seq[String]] = {
    val (direct, wire) = mkFeeds()
    val fileFlags = runGate(direct)(start)
    val wireFlags = runGate(wire)(start)
    withClue("wire decisions must equal file decisions row for row: ") {
      wireFlags shouldBe fileFlags
    }
    fileFlags
  }

  test("DSIR selection gate: file == wire decisions") {
    val lr = TextAnalysis.dsirLrTable(spark, Dir)
    val flags = fileEqWire(docFeeds _)((feed, cb) =>
      DsirStreams.selectionGate(feed, lr, cb))
    flags.keySet shouldBe docRows.map(_._1).toSet
  }

  test("LM quality gate: file == wire decisions") {
    val lm = TextAnalysis.lmTable(spark, Dir)
    val flags = fileEqWire(docFeeds _)((feed, cb) =>
      QualityStreams.qualityGate(feed, lm, cb))
    flags.keySet shouldBe docRows.map(_._1).toSet
  }

  test("stateful incremental-dedup gate: file == wire decisions " +
      "against the same corpus index") {
    val index = DedupStreams.corpusIndex(
      graft.Tables.documents(spark, Dir)
        .filter(col("doc_id") % 2 === 0).select("doc_id", "text"))
    val flags = fileEqWire(docFeeds _)((feed, cb) =>
      DedupStreams.incrementalDedup(feed, index)(cb).start())
    flags.keySet shouldBe docRows.map(_._1).toSet
  }

  test("n-gram decontamination gate: file == wire scores, with real " +
      "eval-slice hits") {
    val postings = Dedup.evalPostings(spark, Dir)
    val flags = fileEqWire(docFeeds _)((feed, cb) =>
      DecontamStreams.ngramGate(feed, postings, cb))
    // docs 0, mod, 2*mod… are the eval slice itself — they must hit
    withClue("the eval-slice docs in the feed must score hits: ") {
      flags should not be empty
    }
  }

  test("embedding decontamination gate: file == wire scores over the " +
      "embeddings wire shape") {
    val evalVecs = Similarity.semContamEvalVecs(spark, Dir)
    val flags = fileEqWire(embFeeds _)((feed, cb) =>
      DecontamStreams.embeddingGate(feed, evalVecs,
        onBatch = cb))
    withClue("the eval-slice vectors in the feed must score hits: ") {
      flags should not be empty
    }
  }
}
