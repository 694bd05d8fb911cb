package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import EventStreams.EventRow
import SessionStreams._

/** Streaming entry–exit panel ≡ batch q208: the closed-session rows
  * and the consumer matrix over the REAL sf0.001 events equal the
  * batch query bit for bit once the stream is flushed; mid-stream, the
  * emitted sessions are exactly the sessions the watermark has proven
  * over; gap/timeout behavior follows q208's second-truncated 1800 s
  * rule. */
class SessionStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def flushSentinel(lastTs: Timestamp): EventRow =
    // 10 days past the corpus: every real session's horizon passes
    EventRow(Long.MaxValue, new Timestamp(lastTs.getTime + 10L * 86400000L),
      -1L, "sentinel", 0.0, "{}")

  test("full-corpus flush: closed sessions and the matrix are bit-equal " +
      "to batch q208 on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = graft.Tables.events(spark, SparkSpec.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[EventRow].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val lastTs = events.map(_.ts).maxBy(_.getTime)

    val in = MemoryStream[EventRow]
    val q = closedSessions(in.toDS())
      .writeStream.format("memory").queryName("sessions_full")
      .outputMode(OutputMode.Append()).start()
    try {
      // three time-ordered micro-batches + the flushing sentinel
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { b =>
        in.addData(b.toSeq: _*); q.processAllAvailable()
      }
      in.addData(flushSentinel(lastTs)); q.processAllAvailable()

      val closed = spark.table("sessions_full").as[ClosedSession]
        .filter(_.user_id >= 0L) // drop the sentinel user's own session
      // (a) per-session rows equal the batch per-session frame
      val batchPer = SparkEntry.queries("q208_entry_exit")(
        spark, SparkSpec.Sf0001) // forces the memoized sessionized build
      val expectedPer = graft.operators.Events
        .sessionized(spark, SparkSpec.Sf0001)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          graft.functions.ArgMaxAgg.argMax(
            struct(negate(col("ord"))), col("event_type")).as("entry_type"),
          graft.functions.ArgMaxAgg.argMax(
            struct(col("ord")), col("event_type")).as("exit_type"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("entry_type"), col("exit_type"),
          col("n_events"))
        .as[(Long, String, String, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val gotPer = closed.collect()
        .map(c => (c.user_id, c.entry_type, c.exit_type, c.n_events))
        .groupBy(identity).view.mapValues(_.length).toMap
      gotPer shouldBe expectedPer

      // (b) the consumer matrix equals batch q208 row for row
      val gotMatrix = entryExitMatrix(closed.toDF())
        .collect().map(_.toSeq).toSeq
      val expMatrix = batchPer.collect().map(_.toSeq).toSeq
      gotMatrix shouldBe expMatrix

      // (c) the value panel equals batch q229 row for row (the exact
      // long units equal the batch DECIMAL(18,4)*10^4 sums)
      val gotValue = entryValuePanel(closed.toDF())
        .collect().map(_.toSeq).toSeq
      val expValue = SparkEntry.queries("q229_entry_value")(
        spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
      gotValue shouldBe expValue
    } finally q.stop()
  }

  test("sessions close on the exact second-truncated 1800 s gap; " +
      "mid-stream emissions are final and bounce rows are single-event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L // 2024-01-01 UTC
    def ev(id: Long, offsetMs: Long, tpe: String, u: Long = 7L): EventRow =
      EventRow(id, new Timestamp(t0 + offsetMs), u, tpe, 1.0, "{}")

    val in = MemoryStream[EventRow]
    val q = closedSessions(in.toDS())
      .writeStream.format("memory").queryName("sessions_gap")
      .outputMode(OutputMode.Append()).start()
    try {
      // session 1: view → click, then exactly 1800 s later another event
      // STAYS (gap rule is strictly-greater, at second grain: an 1800.9 s
      // wall-clock gap whose truncated diff is 1800 also stays)
      in.addData(ev(1, 0, "view"), ev(2, 60000, "click"),
        ev(3, 60000 + 1800000, "purchase"),
        ev(4, 60000 + 1800000 + 1800900, "error"))
      q.processAllAvailable()
      spark.table("sessions_gap").count() shouldBe 0 // nothing proven over

      // 1801 truncated seconds after the last event: new session opens,
      // the old one closes with entry=view exit=error
      in.addData(ev(5, 60000 + 1800000 + 1800900 + 1801000, "signup"))
      q.processAllAvailable()
      val first = spark.table("sessions_gap").as[ClosedSession].collect()
      first.length shouldBe 1
      first.head.copy(value_u = 0L) shouldBe ClosedSession(7L, "view", "error", 4L, 0L)

      // a lone event for another user, then the flushing sentinel:
      // the singleton closes as a BOUNCE (entry == exit, n == 1)
      in.addData(ev(6, 5500000, "view", u = 8L))
      in.addData(flushSentinel(new Timestamp(t0 + 8000000L)))
      q.processAllAvailable()
      val all = spark.table("sessions_gap").as[ClosedSession].collect()
        .filter(_.user_id >= 0L)
      all.length shouldBe 3 // user 7's two sessions + user 8's bounce
      val bounce = all.find(_.user_id == 8L).get
      bounce shouldBe ClosedSession(8L, "view", "view", 1L, 10000L)
      val m = entryExitMatrix(all.toSeq.toDF()).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      m(("view", "view")) shouldBe ((1L, 1L, 1000000L)) // the bounce
    } finally q.stop()
  }

  test("within-batch disorder is repaired to the (ts, event_id) total " +
      "order: entry/exit come from the sort, not arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    def ev(id: Long, offsetMs: Long, tpe: String): EventRow =
      EventRow(id, new Timestamp(t0 + offsetMs), 9L, tpe, 1.0, "{}")
    val in = MemoryStream[EventRow]
    val q = closedSessions(in.toDS())
      .writeStream.format("memory").queryName("sessions_disorder")
      .outputMode(OutputMode.Append()).start()
    try {
      // arrival order scrambled; ties on ts broken by event_id
      in.addData(ev(3, 120000, "purchase"), ev(1, 0, "view"),
        ev(2, 0, "click")) // ids 1,2 same ts: id order decides entry
      in.addData(flushSentinel(new Timestamp(t0 + 8000000L)))
      q.processAllAvailable()
      val got = spark.table("sessions_disorder").as[ClosedSession]
        .collect().filter(_.user_id >= 0L)
      got.length shouldBe 1
      got.head shouldBe ClosedSession(9L, "view", "purchase", 3L, 30000L)
    } finally q.stop()
  }
}
