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

  test("a cross-batch late event older than the open session's gap " +
      "window isolates as its own closed singleton; the live session " +
      "keeps its entry, count, and value") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1704067200000L
    def ev(id: Long, offsetMs: Long, tpe: String): EventRow =
      EventRow(id, new Timestamp(t0 + offsetMs), 11L, tpe, 1.0, "{}")
    val in = MemoryStream[EventRow]
    val q = closedSessions(in.toDS())
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 opens a session at t0+3h (view → click); the 1 h
      // watermark delay puts the watermark at start − 3540 s
      in.addData(ev(10, 10800000, "view"), ev(11, 10860000, "click"))
      q.processAllAvailable()
      // batch 2 carries a late event 2400 s before the open session's
      // start: ABOVE the watermark (so Spark's own late-row filter lets
      // it through to the state function) yet older than the session's
      // gap window (start − 1800 s) — it must close instantly as its
      // own bounce, NOT merge, NOT re-elect the entry
      in.addData(ev(9, 10800000 - 2400000, "error"))
      q.processAllAvailable()
      val mid = spark.table("sessions_late").as[ClosedSession].collect()
      mid.toSeq shouldBe Seq(ClosedSession(11L, "error", "error", 1L, 10000L))
      // batch 3 extends the live session, then the sentinel flushes it:
      // entry is still the original view, n counts only the 3 live events
      in.addData(ev(12, 10920000, "purchase"))
      in.addData(flushSentinel(new Timestamp(t0 + 11000000L)))
      q.processAllAvailable()
      val all = spark.table("sessions_late").as[ClosedSession].collect()
        .filter(_.user_id >= 0L)
      all.length shouldBe 2
      val live = all.find(_.entry_type == "view").get
      live shouldBe ClosedSession(11L, "view", "purchase", 3L, 30000L)
    } finally q.stop()
  }

  test("checkpointed session stream killed and restarted mid-ingest " +
      "closes every session exactly once, bit-equal to batch q208/q229") {
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions.col

    val events = graft.Tables.events(spark, SparkSpec.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[EventRow].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val half = events.length / 2
    val lastTs = events.map(_.ts).maxBy(_.getTime)

    val inDir = Files.createTempDirectory("graft-sess-restart-in").toFile
    inDir.deleteOnExit()
    val ckpt = Files.createTempDirectory("graft-sess-restart-ckpt").toFile
    ckpt.deleteOnExit()

    // first half, staged as two time-ordered files
    def stage(rows: Seq[EventRow], files: Int): Unit = {
      implicit val enc = org.apache.spark.sql.Encoders.product[EventRow]
      rows.grouped(math.max(1, rows.length / files + 1)).foreach { g =>
        spark.createDataset(g.toSeq).coalesce(1)
          .write.mode("append").parquet(inDir.getAbsolutePath)
      }
    }
    stage(events.take(half).toSeq, 2)

    val collected = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    def runStream(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(inDir.getAbsolutePath).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir.getAbsolutePath)
        .as[EventRow]
      val q = closedSessions(src).toDF().writeStream
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode(OutputMode.Append())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.as[ClosedSession].collect()
          collected.synchronized { collected ++= rows }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    runStream() // ...then killed mid-ingest
    // second half + the flushing sentinel arrive while the stream is down
    stage(events.drop(half).toSeq :+ flushSentinel(lastTs), 3)
    runStream() // restart on the SAME checkpoint

    val mine = collected.filter(_.user_id >= 0L)
    // exactly-once: the multiset of closed sessions equals batch q208's
    // per-session frame (no session emitted twice across the restart)
    val expected = {
      graft.SparkEntry.queries("q208_entry_exit")(spark, SparkSpec.Sf0001)
      graft.operators.Events.sessionized(spark, SparkSpec.Sf0001)
        .groupBy(col("user_id"), col("session_id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .count()
    }
    withClue("each session closed exactly once across the restart: ") {
      mine.size.toLong shouldBe expected
    }
    // the count pin above plus the value-panel equality below make the
    // exactly-once claim airtight: a session emitted twice (or lost)
    // across the restart would change BOTH the session count and the
    // per-door value sums
    // and the value panel over the restarted stream equals batch q229
    val gotValue = entryValuePanel(mine.toSeq.toDF())
      .collect().map(_.toSeq).toSeq
    val expValue = graft.SparkEntry.queries("q229_entry_value")(
      spark, SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    gotValue shouldBe expValue
  }
}
