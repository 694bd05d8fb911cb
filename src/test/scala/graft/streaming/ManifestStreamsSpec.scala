package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The streaming manifest must be exactly batch q151's monoid fields
  * over everything seen, at every micro-batch boundary — checked
  * against an INDEPENDENT pure-JVM md5 replay (MessageDigest, not the
  * Spark expression), so a hashing drift on either side fails loudly.
  * A mid-stream single-character edit to one source must move exactly
  * that source's checksum. */
class ManifestStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Independent replay of Parity.md5u32(doc_id ':' text): unsigned
    * 32-bit int from the first 4 md5 bytes. */
  private def md5u32Ref(id: Long, text: String): Long = lane(id, text, 0)

  /** Lane b: md5 bytes 4–7 (hex chars 9–16), Parity.md5u32b's replay. */
  private def md5u32bRef(id: Long, text: String): Long = lane(id, text, 4)

  private def lane(id: Long, text: String, off: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$id:$text".getBytes(StandardCharsets.UTF_8))
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
  }

  private def docRow(id: Long, text: String, src: String) =
    (id, text, "en", src, text.length.toLong)

  test("every boundary equals the independent md5 fold; an edit moves " +
      "only its source") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val latest = scala.collection.mutable.Map
      .empty[String, ManifestStreams.ManifestSnapshot]
    val q = ManifestStreams.manifest(docs)
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[ManifestStreams.ManifestSnapshot],
            _: Long) =>
          latest.synchronized {
            b.collect().foreach(s => latest(s.source) = s)
          }
      }.start()

    val batches = Seq(
      Seq(docRow(1L, "alpha beta", "sA"), docRow(101L, "one two", "sB")),
      Seq(docRow(2L, "gamma", "sA"), docRow(3L, "delta", "sA")),
      // v2 of doc 1: the "edit" arrives as a new manifest contribution
      Seq(docRow(4L, "alpha beta!", "sA"), docRow(102L, "three", "sB")))

    val fed = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var csA = 0L
    try {
      batches.foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        latest.synchronized {
          fed.groupBy(_._4).foreach { case (src, rows) =>
            val snap = latest(src)
            snap.n_docs shouldBe rows.size.toLong
            snap.sum_chars shouldBe rows.map(_._5).sum
            snap.checksum shouldBe
              rows.map(r => md5u32Ref(r._1, r._2)).reduce(_ ^ _)
            snap.checksum_b shouldBe
              rows.map(r => md5u32bRef(r._1, r._2)).reduce(_ ^ _)
          }
          if (csA == 0L) csA = latest("sA").checksum
        }
      }
      // the batch-3 edit moved sA's checksum from its batch-1 value
      latest.synchronized {
        latest("sA").checksum should not be csA
      }
    } finally q.stop()
  }
}
