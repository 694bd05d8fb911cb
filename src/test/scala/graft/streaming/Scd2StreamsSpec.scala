package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The streaming SCD2 compaction must be batch q145 over everything
  * seen: at every batch boundary the accumulated CLOSED emissions
  * equal the batch run's `is_current = false` rows on the fed prefix —
  * including a version run that straddles a micro-batch boundary
  * (closed only when the cross-batch change arrives, versioned
  * correctly from state) — and nothing is ever emitted twice. */
class Scd2StreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("closed emissions equal batch q145's closed rows at every " +
      "boundary; cross-batch runs version from state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // user 1: view@10 view@20 | click@30 | view@50  (run straddles b0/b1)
    // user 2: error@15        | error@35 | click@60 (extends, then closes)
    val batches = Seq(
      Seq((0L, 10L, 1, "view"), (1L, 20L, 1, "view"), (10L, 15L, 2, "error")),
      Seq((2L, 30L, 1, "click"), (11L, 35L, 2, "error")),
      Seq((3L, 50L, 1, "view"), (12L, 60L, 2, "click")))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, String)]
    val events = mem.toDF().toDF("event_id", "secs", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(secs * 1000000) AS ts",
        "CAST(user_id AS LONG) AS user_id", "event_type")
      .as[Scd2Streams.Scd2Event]

    val closed = scala.collection.mutable.ArrayBuffer
      .empty[Scd2Streams.ClosedVersion]
    val q = Scd2Streams.compact(events)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[Scd2Streams.ClosedVersion],
            _: Long) => closed.synchronized { closed ++= b.collect(); () }
      }.start()

    val fed = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int, String)]
    def batchClosed(): Set[(Long, Long, String, Long, Long)] = {
      val dir = Files.createTempDirectory("scd2s_").toString
      fed.toSeq.map { case (id, s, u, et) => (id, ts(s), u, et, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      SparkEntry.queries("q145_scd2_intervals")(spark, dir)
        .filter("NOT is_current")
        .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
          r.getString(2), r.getLong(3), r.getLong(4))).toSet
    }

    try {
      batches.foreach { b =>
        mem.addData(b)
        q.processAllAvailable()
        fed ++= b
        closed.synchronized {
          closed.map(c => (c.user_id, c.version_no, c.event_type,
            c.valid_from_us, c.valid_to_us)).toSet shouldBe batchClosed()
          // append-mode finality: no duplicate emissions, ever
          closed.size shouldBe closed.toSet.size
        }
      }
    } finally q.stop()
  }
}
