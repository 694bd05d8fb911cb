package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.{Dedup, Similarity}

/** Stream/batch parity for the decontamination gate: the MemoryStream-
  * driven [[DecontamStreams]] legs must produce exactly batch q73's
  * (n-gram), q118's (8-word span), and q105's (embedding) score rows on
  * the same corpus, across micro-batch splits (scoring is stateless
  * given the frozen eval artifacts, so batch boundaries must not
  * matter), and the combined gate must hand every incoming doc exactly
  * one verdict whose contaminated set is the union of the three batch
  * reports.
  */
class DecontamStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  test("ngram gate equals batch q73 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % Dedup.EvalSliceMod =!= 0)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var batches = 0
    val q = DecontamStreams.ngramGate(docs, Dedup.evalPostings(spark, dir),
      (scored, _) => collected.synchronized {
        collected ++= scored
          .select("doc_id", "n_hits", "n_shingles", "ratio_u", "min_eval_doc")
          .as[(Long, Long, Long, Long, Long)].collect()
        batches += 1
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    batches should be > 1
    val batch = SparkEntry.queries("q73_decontamination")(spark, dir)
      .select("doc_id", "n_hits", "n_shingles", "ratio_u", "min_eval_doc")
      .as[(Long, Long, Long, Long, Long)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // no doc scored twice
  }

  test("span gate equals batch q118 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % Dedup.EvalSliceMod =!= 0)
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    val q = DecontamStreams.spanGate(docs, Dedup.evalSpanWindows(spark, dir),
      (scored, _) => collected.synchronized {
        collected ++= scored
          .select("doc_id", "n_hit_windows", "n_windows", "hit_frac_u",
            "n_hit_occurrences", "min_eval_doc")
          .as[(Long, Long, Long, Long, Long, Long)].collect()
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = SparkEntry.queries("q118_span_decontamination")(spark, dir)
      .select("doc_id", "n_hit_windows", "n_windows", "hit_frac_u",
        "n_hit_occurrences", "min_eval_doc")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // no doc scored twice
  }

  test("embedding gate equals batch q105 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.embeddings(spark, dir)
      .filter($"vec_id" % Dedup.EvalSliceMod =!= 0)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val embs = mem.toDF().toDF("vec_id", "embedding")

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = DecontamStreams.embeddingGate(embs,
      Similarity.semContamEvalVecs(spark, dir),
      onBatch = (scored, _) => collected.synchronized {
        collected ++= scored
          .select("vec_id", "n_hits", "max_cos_u", "closest_eval")
          .as[(Long, Long, Long, Long)].collect()
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = SparkEntry.queries("q105_semantic_decontam")(spark, dir)
      .select("vec_id", "n_hits", "max_cos_u", "closest_eval")
      .as[(Long, Long, Long, Long)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length
  }

  test("combined gate: every incoming doc gets exactly one verdict, " +
      "contaminated = q73 ∪ q118 ∪ q105, invariant to the batch split") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val joined = graft.Tables.documents(spark, dir)
      .join(graft.Tables.embeddings(spark, dir),
        $"doc_id" === $"vec_id")
      .filter($"doc_id" % Dedup.EvalSliceMod =!= 0)
      .select("doc_id", "text", "embedding")
      .as[(Long, String, Seq[Float])].collect().toSeq

    val q73Ids = SparkEntry.queries("q73_decontamination")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val q118Ids = SparkEntry.queries("q118_span_decontamination")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val q105Ids = SparkEntry.queries("q105_semantic_decontam")(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val streamedIds = joined.map(_._1).toSet
    val expectContaminated =
      (q73Ids union q118Ids union q105Ids) intersect streamedIds

    def run(nChunks: Int): Seq[(Long, Long, Long, Long, Boolean)] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, String, Seq[Float])]
      val rows = mem.toDF().toDF("doc_id", "text", "embedding")
      val collected = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Boolean)]
      val q = DecontamStreams.combinedGate(rows,
        Dedup.evalPostings(spark, dir),
        Similarity.semContamEvalVecs(spark, dir),
        Dedup.evalSpanWindows(spark, dir),
        onBatch = (scored, _) => collected.synchronized {
          collected ++= scored
            .select("doc_id", "ngram_hits", "span_hits", "sem_hits",
              "contaminated")
            .as[(Long, Long, Long, Long, Boolean)].collect()
        })
      try {
        joined.grouped((joined.size + nChunks - 1) / nChunks).foreach { c =>
          mem.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
      collected.toSeq
    }

    val once = run(1)
    once.size shouldBe joined.size // one verdict per incoming doc
    once.map(_._1).toSet shouldBe streamedIds
    once.filter(_._5).map(_._1).toSet shouldBe expectContaminated
    // per-leg flag sets must match the batch reports exactly
    once.filter(_._2 > 0).map(_._1).toSet shouldBe
      (q73Ids intersect streamedIds)
    once.filter(_._3 > 0).map(_._1).toSet shouldBe
      (q118Ids intersect streamedIds)
    once.filter(_._4 > 0).map(_._1).toSet shouldBe
      (q105Ids intersect streamedIds)

    val split = run(4)
    split.toSet shouldBe once.toSet // batch boundaries change nothing
  }
}
