package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The streaming gate is the KEEP-CHAIN rule: verdicts must equal an
  * independent driver-side keep-chain replay at every micro-batch
  * boundary, state must carry across batches, and the one case where
  * keep-chain and batch q155's lag rule DISAGREE — a steady drizzle of
  * sub-window redeliveries — must come out the debounce way (the lag
  * rule would suppress the stream forever). */
class DebounceStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** Independent keep-chain replay (per (user, type), time order). */
  private def ref(rows: Seq[(Long, Long, Long, String)],
      gapS: Long): Map[Long, Boolean] =
    rows.groupBy(r => (r._3, r._4)).flatMap { case (_, es) =>
      var last = Option.empty[Long]
      es.sortBy(e => (e._2, e._1)).map { case (id, t, _, _) =>
        val keep = last.forall(l => t - l > gapS)
        if (keep) last = Some(t)
        id -> keep
      }
    }

  test("keep-chain verdicts equal the reference at every boundary; a " +
      "200s redelivery drizzle re-admits where the lag rule never would") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // u1 clicks every 200 s: keep-chain keeps 0, 400, 800 (gap from the
    // last KEPT exceeds 300) and drops 200, 600 — the lag rule would
    // drop everything after 0. u2 interleaves a different type.
    val rows = Seq(
      (0L, 0L, 1L, "click"), (1L, 200L, 1L, "click"),
      (2L, 400L, 1L, "click"), (3L, 600L, 1L, "click"),
      (4L, 800L, 1L, "click"),
      (5L, 100L, 2L, "view"), (6L, 500L, 2L, "view"))
    val expected = ref(rows.map(r => (r._1, r._2, r._3, r._4)), 300L)
    expected(0L) shouldBe true
    expected(1L) shouldBe false
    expected(2L) shouldBe true // the divergence case vs the lag rule
    expected(3L) shouldBe false
    expected(4L) shouldBe true

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val docs = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")

    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    val q = DebounceStreams.debounce(docs)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[DebounceStreams.Verdict], _: Long) =>
          got.synchronized {
            b.collect().foreach(v => got(v.event_id) = v.kept)
          }
      }.start()
    try {
      // time-ordered micro-batches (the per-key bus ordering); the cut
      // lands mid-drizzle so state must carry the kept chain across
      rows.sortBy(_._2).grouped(3).foreach { chunk =>
        mem.addData(chunk.map(r => (r._1, ts(r._2), r._3, r._4)))
        q.processAllAvailable()
        got.synchronized {
          got.foreach { case (id, kept) => kept shouldBe expected(id) }
        }
      }
    } finally q.stop()
    got.synchronized { got.toMap shouldBe expected }
  }
}
