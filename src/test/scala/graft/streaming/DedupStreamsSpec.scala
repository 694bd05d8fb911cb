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
}
