package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import EventStreams.EventRow
import TransitionStreams._

/** Streaming transition-kernel monitor: on an in-order per-user feed
  * the stitched pairs aggregate to EXACTLY batch q191's kernel; events
  * at or behind a user's frontier (replays, order violations) surface
  * as late markers, never silent drops. */
class TransitionStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(minute: Long): Timestamp =
    new Timestamp(86400000L + minute * 60000L)

  private def ev(id: Long, minute: Long, user: Long, typ: String): EventRow =
    EventRow(id, ts(minute), user, typ, 1.0, "{}")

  private val batch1 = Seq(
    ev(1, 0, 1, "click"), ev(2, 1, 1, "view"),
    ev(10, 0, 2, "view"), ev(11, 2, 2, "view"))
  private val batch2 = Seq(
    ev(3, 2, 1, "click"), ev(4, 3, 1, "purchase"),
    ev(12, 4, 2, "error"))

  test("in-order feed: stitched pairs aggregate bit-equal to batch q191") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("trans_").toString
    (batch1 ++ batch2).toDF().write.parquet(s"$dir/events.parquet")
    val expected = SparkEntry.queries("q191_event_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val in = MemoryStream[EventRow]
    val q = transitions(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()

      val pairs = spark.table("trans").as[Transition].collect()
      pairs.exists(_.late) shouldBe false
      // consumer-side kernel: the ≤|types|² aggregate with q191's
      // exact floor division
      val cells = pairs.groupBy(p => (p.from_type, p.to_type))
        .view.mapValues(_.length.toLong).toMap
      val marg = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val kernel = cells.map { case ((f, t), c) =>
        (f, t, c, marg(f), Math.floorDiv(1000000L * c, marg(f)))
      }.toSet
      kernel shouldBe expected
    } finally q.stop()
  }

  test("replays and order violations surface as late markers, fold nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = transitions(in.toDS())
      .writeStream.format("memory").queryName("trans_late")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      val before = spark.table("trans_late").as[Transition].collect()

      // exact replay of batch 1 + one genuinely out-of-order event
      // (user 1's frontier is minute 1 / id 2)
      in.addData(batch1 :+ ev(0, 0, 1, "signup"): _*)
      q.processAllAvailable()
      val after = spark.table("trans_late").as[Transition].collect()

      before.count(_.late) shouldBe 0
      after.count(_.late) shouldBe (batch1.length + 1) // every row surfaces
      // the non-late pair set is unchanged — nothing folded twice
      after.filterNot(_.late).toSet shouldBe before.filterNot(_.late).toSet
    } finally q.stop()
  }
}
