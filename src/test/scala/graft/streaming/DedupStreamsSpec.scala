package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The streaming ingest loop must make EXACTLY the batch q69 decisions:
  * the new batch (odd doc_ids) arrives as a multi-micro-batch file
  * stream, is deduplicated per batch against the static corpus index
  * (even doc_ids), and the union of streamed decisions equals batch
  * q69's output on the same rows — proving the foreachBatch cascade is
  * the same operator, not a drifting re-implementation. */
class DedupStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("streaming incremental dedup decisions equal batch q69 (sf0.001)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001)

    // Static corpus = even doc_ids, exactly q69's split.
    val index = DedupStreams.corpusIndex(docs.filter(col("doc_id") % 2 === 0))

    // New batch = odd doc_ids, written as FOUR files so the stream
    // processes them across several micro-batches (maxFilesPerTrigger=1).
    val inDir = Files.createTempDirectory("graft-dedup-stream").toFile
    inDir.deleteOnExit()
    docs.filter(col("doc_id") % 2 === 1)
      .repartition(4).write.mode("overwrite").parquet(inDir.getAbsolutePath)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var batches = 0
    val q = DedupStreams.incrementalDedup(
      DedupStreams.documentSource(spark, inDir.getAbsolutePath), index) {
      (decisions, _) =>
        collected.synchronized {
          collected ++= decisions.select("doc_id", "status", "match_doc")
            .as[(Long, String, Long)].collect()
          batches += 1
        }
    }.start()
    try q.processAllAvailable() finally q.stop()

    batches should be > 1 // genuinely incremental, not one big batch
    val batch69 = SparkEntry.queries("q69_incremental_dedup")(spark, SparkSpec.Sf0001)
      .as[(Long, String, Long)].collect()
    collected.size shouldBe batch69.length // each new doc decided exactly once
    collected.toSet shouldBe batch69.toSet
    collected.count(_._2 != "unique") should be > 0 // the cascade actually fired
  }

  test("checkpointed stream killed and restarted mid-ingest decides every " +
      "doc exactly once (no duplicates, no gaps)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001)
    val index = DedupStreams.corpusIndex(docs.filter(col("doc_id") % 2 === 0))

    val inDir = Files.createTempDirectory("graft-dedup-restart-in").toFile
    inDir.deleteOnExit()
    val ckpt = Files.createTempDirectory("graft-dedup-restart-ckpt").toFile
    ckpt.deleteOnExit()

    val newDocs = docs.filter(col("doc_id") % 2 === 1).persist()
    // First half of the stream: odd docs with doc_id % 4 == 1, two files.
    newDocs.filter(col("doc_id") % 4 === 1)
      .repartition(2).write.mode("append").parquet(inDir.getAbsolutePath)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def sink(decisions: org.apache.spark.sql.DataFrame, id: Long): Unit =
      collected.synchronized {
        collected ++= decisions.select("doc_id", "status", "match_doc")
          .as[(Long, String, Long)].collect()
      }
    def runStream(): Unit = {
      val q = DedupStreams.incrementalDedup(
        DedupStreams.documentSource(spark, inDir.getAbsolutePath), index,
        checkpointLocation = Some(ckpt.getAbsolutePath))(sink).start()
      try q.processAllAvailable() finally q.stop()
    }

    runStream() // …then the stream is killed (stopped) mid-ingest
    val afterFirst = collected.size
    afterFirst should be > 0

    // More files arrive while the stream is down.
    newDocs.filter(col("doc_id") % 4 === 3)
      .repartition(2).write.mode("append").parquet(inDir.getAbsolutePath)
    runStream() // restart on the SAME checkpoint
    newDocs.unpersist(blocking = false)

    // The restarted stream must pick up ONLY the files that arrived while
    // it was down — nothing from before the kill is re-decided…
    collected.drop(afterFirst).foreach(_._1 % 4 shouldBe 3)
    // …and overall: exactly the batch-q69 decision set, each doc once.
    val batch69 = SparkEntry.queries("q69_incremental_dedup")(spark, SparkSpec.Sf0001)
      .as[(Long, String, Long)].collect()
    collected.size shouldBe batch69.length
    collected.toSet shouldBe batch69.toSet
  }

  test("refreshing index: a doc admitted in batch N is caught as a " +
      "duplicate in batch N+k") {
    import spark.implicits._
    // 60-word texts so the word-3-gram shingle pipeline has real material.
    val words = (0 until 60).map(i => s"w$i")
    val textA = words.mkString(" ")
    // Change only the LAST word: exactly one of the 58 word-3-gram
    // shingles differs (Jaccard ≈ 0.97), comfortably inside the ≥13/16
    // signature-agreement acceptance band.
    val textANear = words.updated(59, "CHANGED").mkString(" ")
    val textCorpus = (0 until 60).map(i => s"c$i").mkString(" ")

    def docRow(id: Long, text: String) =
      (id, text, "en", "crawl", text.length.toLong)
    val corpus = Seq(docRow(1L, textCorpus))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val inDir = Files.createTempDirectory("graft-dedup-refresh-in").toFile
    inDir.deleteOnExit()
    // Three single-file batches: the original, an exact copy, a near copy.
    Seq(docRow(100L, textA)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)
    Seq(docRow(200L, textA)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)
    Seq(docRow(300L, textANear)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)

    val refresher = new DedupStreams.RefreshingIndex(
      DedupStreams.corpusIndex(corpus))
    val decisions = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val q = DedupStreams.incrementalDedup(
      DedupStreams.documentSource(spark, inDir.getAbsolutePath),
      refresher.current, refresher = Some(refresher)) { (d, _) =>
      decisions.synchronized {
        d.select("doc_id", "status", "match_doc")
          .as[(Long, String, Long)].collect()
          .foreach { case (id, st, m) => decisions(id) = (st, m) }
      }
    }.start()
    try q.processAllAvailable() finally { q.stop(); refresher.close() }

    decisions(100L) shouldBe ("unique", -1L) // admitted in batch N
    decisions(200L) shouldBe ("dup_exact", 100L) // caught k=1 batch later
    decisions(300L) shouldBe ("dup_near", 100L) // caught k=2 batches later
  }

  test("refreshing index WITH bloom pre-filter: admitted docs merge into " +
      "the sketches, so the late duplicate is still caught (a stale " +
      "bloom would silently admit it)") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    val textA = words.mkString(" ")
    val textANear = words.updated(59, "CHANGED").mkString(" ")
    def docRow(id: Long, text: String) =
      (id, text, "en", "crawl", text.length.toLong)
    val corpus = Seq(docRow(1L, (0 until 60).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val inDir = Files.createTempDirectory("graft-dedup-bloom-in").toFile
    inDir.deleteOnExit()
    Seq(docRow(100L, textA)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)
    Seq(docRow(200L, textA)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)
    Seq(docRow(300L, textANear)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(inDir.getAbsolutePath)

    // Bloom-carrying index: doc 100's fp/bands are NOT in the corpus
    // sketches — only the admit-time merge can make 200/300 visible.
    val refresher = new DedupStreams.RefreshingIndex(
      DedupStreams.corpusIndex(corpus, withBlooms = true,
        bloomExpectedItems = 1000))
    refresher.current.blooms.isDefined shouldBe true
    val decisions = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val q = DedupStreams.incrementalDedup(
      DedupStreams.documentSource(spark, inDir.getAbsolutePath),
      refresher.current, refresher = Some(refresher)) { (d, _) =>
      decisions.synchronized {
        d.select("doc_id", "status", "match_doc")
          .as[(Long, String, Long)].collect()
          .foreach { case (id, st, m) => decisions(id) = (st, m) }
      }
    }.start()
    try q.processAllAvailable() finally { q.stop(); refresher.close() }

    decisions(100L) shouldBe ("unique", -1L)
    decisions(200L) shouldBe ("dup_exact", 100L) // via merged fp bloom
    decisions(300L) shouldBe ("dup_near", 100L) // via merged band bloom
  }

  test("source-agnostic: a MemoryStream-driven run makes the same " +
      "decisions as the file-source stream (batch q69's set)") {
    import spark.implicits._
    // The Spark 4.1 location (moved from execution.streaming).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001)
    val index = DedupStreams.corpusIndex(docs.filter(col("doc_id") % 2 === 0))

    val newRows = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var batches = 0
    // No change to DedupStreams: the ingest loop takes any streaming
    // DataFrame — only the source construction differs from the file run.
    val q = DedupStreams.incrementalDedup(memDocs, index) { (decisions, _) =>
      collected.synchronized {
        collected ++= decisions.select("doc_id", "status", "match_doc")
          .as[(Long, String, Long)].collect()
        batches += 1
      }
    }.start()
    try {
      // Three explicit micro-batches, like the file test's 4 files.
      newRows.grouped((newRows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    batches should be > 1
    val batch69 = SparkEntry.queries("q69_incremental_dedup")(spark, SparkSpec.Sf0001)
      .as[(Long, String, Long)].collect()
    collected.size shouldBe batch69.length
    collected.toSet shouldBe batch69.toSet
  }

  test("batchId markers make a replayed batch a no-op: onBatch runs once, " +
      "the index is not double-admitted (exactly-once output)") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    def docRow(id: Long, text: String) =
      (id, text, "en", "crawl", text.length.toLong)
    val corpus = Seq(docRow(1L, (0 until 60).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq(docRow(100L, words.mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val markers = Files.createTempDirectory("graft-dedup-markers").toFile
    markers.deleteOnExit()
    val refresher = new DedupStreams.RefreshingIndex(
      DedupStreams.corpusIndex(corpus))
    var onBatchCalls = 0
    def run(): Boolean = DedupStreams.processBatch(
      batch, batchId = 7L, index = refresher.current,
      refresher = Some(refresher),
      onceMarkers = Some(markers.getAbsolutePath),
      onBatch = (_, _) => onBatchCalls += 1)

    run() shouldBe true // first delivery: processed
    onBatchCalls shouldBe 1
    val fpAfterFirst = refresher.current.fp.count() // doc 100 admitted

    // The crash-replay: foreachBatch re-delivers the SAME batchId after
    // a restart whose offsets never committed. The marker written at the
    // end of the first run must make this a no-op.
    run() shouldBe false
    onBatchCalls shouldBe 1 // no duplicate decision-log write
    refresher.current.fp.count() shouldBe fpAfterFirst // no double admit
    refresher.close()
  }

  test("DecisionLog closes the marker-side crash window: a crash " +
      "BETWEEN onBatch and the marker write replays onBatch, and the " +
      "overwrite-by-batchId partition converges to ONE copy of the " +
      "batch's rows (exactly-once end-to-end)") {
    import spark.implicits._
    def docRow(id: Long, text: String) =
      (id, text, "en", "crawl", text.length.toLong)
    val corpus = Seq(docRow(1L, (0 until 60).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val batch = Seq(
      docRow(100L, (0 until 60).map(i => s"w$i").mkString(" ")),
      docRow(101L, (0 until 60).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val logDir = Files.createTempDirectory("graft-decision-log").toFile
    logDir.deleteOnExit()
    val markers = Files.createTempDirectory("graft-dl-markers").toFile
    markers.deleteOnExit()
    val log = new DedupStreams.DecisionLog(
      new java.io.File(logDir, "log").getAbsolutePath)
    val index = DedupStreams.corpusIndex(corpus)

    // Crash simulation: the batch's effects (the decision-log write)
    // fully apply, but the process dies BEFORE the marker write — so
    // run the batch with NO marker dir. That is byte-for-byte the
    // on-disk state a kill between onBatch and the marker leaves.
    DedupStreams.processBatch(batch, batchId = 3L, index = index,
      refresher = None, onceMarkers = None, onBatch = log.write)
    val afterCrash = log.read(spark)
    afterCrash.count() shouldBe 2L

    // Restart: foreachBatch re-delivers batchId 3; no marker exists, so
    // onBatch RUNS AGAIN — and the sink overwrites partition
    // batch_id=3 instead of appending a second copy.
    DedupStreams.processBatch(batch, batchId = 3L, index = index,
      refresher = None, onceMarkers = Some(markers.getAbsolutePath),
      onBatch = log.write) shouldBe true
    val afterReplay = log.read(spark)
    afterReplay.count() shouldBe 2L // converged, not doubled
    afterReplay.select("batch_id").distinct().as[Long].collect()
      .toSeq shouldBe Seq(3L)

    // A LATER batch lands in its own partition, untouched by future
    // replays of batch 3.
    DedupStreams.processBatch(batch.withColumn("doc_id",
        col("doc_id") + 200L), batchId = 4L, index = index,
      refresher = None, onceMarkers = Some(markers.getAbsolutePath),
      onBatch = log.write) shouldBe true
    log.read(spark).count() shouldBe 4L
    // Third delivery of batch 3 now finds its marker: skipped entirely.
    DedupStreams.processBatch(batch, batchId = 3L, index = index,
      refresher = None, onceMarkers = Some(markers.getAbsolutePath),
      onBatch = log.write) shouldBe false
    log.read(spark).count() shouldBe 4L
  }
}
