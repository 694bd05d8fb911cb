package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import EventStreams._

class EventStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Minute-offset timestamps on a day-1 base: an event at exactly epoch 0
    * equals the query's initial watermark and is filtered as late. */
  private def ts(minute: Long): Timestamp = new Timestamp(86400000L + minute * 60000L)

  private def ev(id: Long, minute: Long, user: Long, typ: String = "click",
      value: Double = 1.0): EventRow =
    EventRow(id, ts(minute), user, typ, value, "{}")

  test("hourlyCounts: tumbling windows close and emit after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = hourlyCounts(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 5, 1), ev(2, 20, 1), ev(3, 61, 2, "view"))
      q.processAllAvailable()
      // watermark = 61min - 10min = 51min > hour-0's end? No: 51 < 60 → nothing yet
      spark.table("hourly").count() shouldBe 0

      in.addData(ev(4, 75, 2, "view")) // watermark → 65min: hour 0 closes
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("hour", "event_type", "n_events").as[(Timestamp, String, Long)]
        .collect().toSet
      rows shouldBe Set((ts(0), "click", 2L))
    } finally q.stop()
  }

  test("rateAnomalies: a burst hour flags against the trailing mean; " +
      "warm-up hours never alert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = rateAnomalies(in.toDF(), watermark = "10 minutes",
        threshold = 2.0, minBaselineHours = 3)
      .writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append()).start()
    try {
      var id = 0L
      def burst(hourStart: Long, n: Int): Seq[EventRow] =
        (1 to n).map { i => id += 1; ev(id, hourStart + (i % 50), 1) }
      // Hours 0-2: 10 events each (baseline). Hour 1 at 30 would be a
      // spike, but nHours < 3 there — warm-up must suppress it.
      in.addData(burst(0, 10) ++ burst(60, 30) ++ burst(120, 10): _*)
      q.processAllAvailable()
      // Hour 3: 30 events — 30 / ((10+30+10)/3) = 1.8 → NO flag.
      // Hour 4: 40 events — 40 / ((50+30)/4) = 2.0 → flag.
      in.addData(burst(180, 30) ++ burst(240, 40): _*)
      q.processAllAvailable()
      in.addData(ev(99999, 600, 9, "late-wm-advancer")) // finalize all
      q.processAllAvailable()
      val rows = spark.table("rates")
        .select("event_type", "hour", "n", "baseline_hours", "rate_ratio")
        .as[(String, Timestamp, Long, Long, Double)].collect().toSet
      rows shouldBe Set(("click", ts(240), 40L, 4L, 2.0))
    } finally q.stop()
  }

  test("trending: closed hours rank like batch q93, movement vs the " +
      "type's previous appearance, across watermark jumps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = trending(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("trend")
      .outputMode(OutputMode.Append()).start()
    try {
      var id = 0L
      def n(hourStart: Long, typ: String, k: Int): Seq[EventRow] =
        (1 to k).map { i => id += 1; ev(id, hourStart + (i % 50), 1, typ) }
      // hour 0: click 5 > view 3; hour 1: view 4 > click 2 (rank swap);
      // hour 2: click only — view keeps its stale rank for hour 3's lag.
      in.addData(n(0, "click", 5) ++ n(0, "view", 3): _*)
      in.addData(n(60, "view", 4) ++ n(60, "click", 2): _*)
      in.addData(n(120, "click", 7): _*)
      in.addData(ev({ id += 1; id }, 200, 9, "sentinel")) // close hours 0-2
      q.processAllAvailable()

      val got = spark.table("trend")
        .select("hour", "event_type", "rnk", "moved")
        .as[(Timestamp, String, Long, Option[Long])].collect().toSet
      got shouldBe Set(
        (ts(0), "click", 1L, None),
        (ts(0), "view", 2L, None),
        (ts(60), "view", 1L, Some(1L)),  // 2 → 1
        (ts(60), "click", 2L, Some(-1L)), // 1 → 2
        (ts(120), "click", 1L, Some(1L))) // 2 → 1; view absent, no row
    } finally q.stop()
  }

  test("trending agrees with batch q93 on the testdata events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = SparkSpec.Sf0001
    val rows = graft.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventRow].collect().sortBy(e => toMicros(e.ts))
    val in = MemoryStream[EventRow]
    val q = trending(in.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("trend_batch")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows.toIndexedSeq: _*)
      // sentinel far past the last event so EVERY real hour closes
      val last = rows.last
      in.addData(EventRow(-1L, new Timestamp(last.ts.getTime + 7200000L),
        0L, "sentinel", 0.0, "{}"))
      q.processAllAvailable()

      val streamed = spark.table("trend_batch")
        .filter($"event_type" =!= "sentinel")
        .select("hour", "event_type", "n_events", "rnk", "prev_rnk", "moved")
        .as[(Timestamp, String, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      val sentinelHour = new Timestamp(
        last.ts.getTime + 7200000L - (last.ts.getTime + 7200000L) % 3600000L)
      val batch = graft.SparkEntry.queries("q93_trending")(spark, dir)
        .filter($"hour" < org.apache.spark.sql.functions.lit(sentinelHour))
        .select("hour", "event_type", "n_events", "rnk", "prev_rnk", "moved")
        .as[(Timestamp, String, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  test("firstEvents: duplicate (user, type) dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = firstEvents(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("firsts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 1, 7, "click"), ev(2, 2, 7, "click"), ev(3, 3, 7, "view"))
      q.processAllAvailable()
      val ids = spark.table("firsts").select("event_id").as[Long].collect().sorted
      ids shouldBe Array(1L, 3L)
    } finally q.stop()
  }

  test("sessionize: 30-min gap splits sessions; timeout flushes the last one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = sessionize(in.toDS(), watermark = "5 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at minute 0, 10 (one session), then 60 (a new one).
      in.addData(ev(1, 0, 1, value = 2.0), ev(2, 10, 1, value = 3.0))
      q.processAllAvailable()
      in.addData(ev(3, 60, 1, value = 1.0))
      q.processAllAvailable()
      val s1 = spark.table("sessions").as[Session].collect()
      s1.map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
        s.session_value)).toSet shouldBe
        Set((1L, ts(0), ts(10), 2L, 5.0))

      // An unrelated user's much-later event advances the watermark past
      // minute 60 + 30min gap → user 1's open session times out and emits.
      in.addData(ev(4, 120, 2))
      q.processAllAvailable()
      in.addData(ev(5, 180, 2))
      q.processAllAvailable()
      val s2 = spark.table("sessions").as[Session].collect()
        .filter(_.user_id == 1L)
      s2.map(s => (s.session_start, s.session_end, s.n_events)).toSet shouldBe
        Set((ts(0), ts(10), 2L), (ts(60), ts(60), 1L))
    } finally q.stop()
  }

  test("sessionize agrees with batch q25 on the testdata events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.Events.queries("q25_sessionize")(
      spark, SparkSpec.Sf0001)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

    val events = graft.Tables.events(spark, SparkSpec.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props")).as[EventRow]
      .collect().sortBy(e => e.ts.getTime)

    val in = MemoryStream[EventRow]
    val q = sessionize(in.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_full")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events)
      q.processAllAvailable()
      // Push the watermark far past every open session's horizon.
      val last = events.last
      in.addData(EventRow(-1L, new Timestamp(last.ts.getTime + 86400000L),
        -1L, "flush", 0.0, "{}"))
      q.processAllAvailable()
      val streamed = spark.table("sess_full").as[Session].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
        .toSet
      streamed shouldBe batch
    } finally q.stop()
  }

  test("followWithin: stream-stream interval join pairs events and bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = followWithin(in.toDF(), "click", "purchase", withinMin = 10)
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        ev(1, 0, 1, "click"),
        ev(2, 5, 1, "purchase"),   // within 10 min of click 1 → pair
        ev(3, 30, 1, "purchase"),  // 30 min after click 1 → no pair
        ev(4, 0, 2, "purchase"),   // same minute, different user → no pair
        ev(5, 40, 2, "click"),
        ev(6, 45, 2, "purchase"))  // within 10 min of click 5 → pair
      q.processAllAvailable()
      // Inner interval joins emit as soon as both sides match (no
      // watermark wait needed for inner joins).
      val pairs = spark.table("funnel")
        .select("user_id", "a_id", "b_id").as[(Long, Long, Long)]
        .collect().toSet
      pairs shouldBe Set((1L, 1L, 2L), (2L, 5L, 6L))
    } finally q.stop()
  }

  test("followWithin agrees with a batch interval join on the testdata events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.events(spark, SparkSpec.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props")).as[EventRow].collect()

    val batchDf = events.toSeq.toDF()
    val ba = batchDf.filter(col("event_type") === "click")
      .select(col("event_id").as("a_id"), col("ts").as("a_ts"),
        col("user_id").as("a_user"))
    val bb = batchDf.filter(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"), col("ts").as("b_ts"),
        col("user_id").as("b_user"))
    val expected = ba.join(bb,
        col("a_user") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + org.apache.spark.sql.functions
            .expr("INTERVAL 10 MINUTES"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet

    val in = MemoryStream[EventRow]
    val q = followWithin(in.toDF(), "click", "purchase", withinMin = 10)
      .writeStream.format("memory").queryName("funnel_full")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(events.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("funnel_full")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      streamed shouldBe expected
      expected should not be empty
    } finally q.stop()
  }

  test("native session_window grouping equals the custom-state sessionization (q25)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, session_window}
    // Spark's built-in gap-window — the declarative form of what
    // sessionize does with flatMapGroupsWithState. Same 30-min gap must
    // yield exactly q25's sessions.
    val native = graft.Tables.events(spark, SparkSpec.Sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("session_end"), col("n_events"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val batch = graft.operators.Events.queries("q25_sessionize")(
      spark, SparkSpec.Sf0001)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    native shouldBe batch
  }

  test("eventSource: file-source stream over the events parquet feeds q20's window agg") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val dir = Files.createTempDirectory("events_stream_")
    Files.copy(Paths.get(s"${SparkSpec.Sf0001}/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = hourlyCounts(eventSource(spark, dir.toString), watermark = "1 hour")
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000) shouldBe true
      val streamed = spark.table("file_hourly")
        .select("hour", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      val batch = graft.operators.Events.queries("q20_hourly_events")(
        spark, SparkSpec.Sf0001)
        .select("hour", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      // Append mode only emits windows the final watermark closed; every
      // emitted window must agree exactly with the batch aggregation.
      streamed should not be empty
      streamed.subsetOf(batch) shouldBe true
    } finally q.stop()
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
