package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Stream/batch parity for the chunker: the MemoryStream-driven
  * [[ChunkStreams.chunker]] must produce exactly batch q104's chunk
  * table on the same corpus, across micro-batches (chunking is
  * stateless per doc, so batch boundaries must not matter), with no
  * chunk emitted twice.
  */
class ChunkStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("MemoryStream chunks equal batch q104 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val docs = graft.Tables.documents(spark, dir)

    val rows = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, String)]
    var batches = 0
    val q = ChunkStreams.chunker(memDocs, (chunks, _) =>
      collected.synchronized {
        collected ++= chunks
          .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens",
            "chunk_md5")
          .as[(Long, Long, Long, Long, String)].collect()
        batches += 1
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    batches should be > 1
    val batch = SparkEntry.queries("q104_chunking")(spark, dir)
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens",
        "chunk_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // no chunk emitted twice
  }
}
