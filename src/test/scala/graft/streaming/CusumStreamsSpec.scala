package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The streaming CUSUM monitor must be exactly batch q184 over
  * everything seen: with the reference frozen to the corpus' own
  * (H, per-type totals), the final-boundary snapshots are bit-equal to
  * q184 per type — statistics AND change-point hours; a replayed batch
  * folds nothing; unknown types are counted, never dropped; and a
  * planted sustained shift alarms mid-stream, before the window
  * closes. */
class CusumStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("final boundary bit-equal to batch q184; replay no-op; unknown " +
      "types counted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = SparkSpec.Sf0001
    val hc = graft.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("hour")).as("hour_micros"),
        col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val hours = hc.map(_._1).distinct.sorted
    // H is the DENSE span count (batch q184's grid densifies total-
    // outage hours too); the fold reproduces those gaps itself
    val denseH = (hours.last - hours.head) / 3600000000L + 1L
    val ref = CusumStreams.CusumRef(denseH,
      hc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap)

    val fold = new CusumStreams.CusumFold(ref)
    // three hour-ordered chunks, split on hour boundaries
    val cut1 = hours(hours.size / 3)
    val cut2 = hours(2 * hours.size / 3)
    val chunks = Seq(
      hc.filter(_._1 <= cut1),
      hc.filter(r => r._1 > cut1 && r._1 <= cut2),
      hc.filter(_._1 > cut2))
    var out: (Seq[CusumStreams.CusumSnapshot], Long) = (Nil, 0L)
    chunks.zipWithIndex.foreach { case (c, i) =>
      out = fold.fold(c, i.toLong)
    }
    // replaying the last batch id changes nothing
    fold.fold(chunks.last, 2L) shouldBe out

    val batch = SparkEntry.queries("q184_cusum_shift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getTimestamp(4).getTime * 1000L, r.getLong(5),
        r.getTimestamp(6).getTime * 1000L))).toMap
    val (snaps, unk) = out
    unk shouldBe 0L
    snaps.map(_.event_type).toSet shouldBe batch.keySet
    snaps.foreach { s =>
      val (nh, upU, upFrom, downU, downFrom) = batch(s.event_type)
      s.n_hours shouldBe nh
      s.up_u shouldBe upU
      s.up_from_hour shouldBe upFrom
      s.down_u shouldBe downU
      s.down_from_hour shouldBe downFrom
    }

    // an unknown type is counted into the page channel, state untouched
    val (snaps2, unk2) = fold.fold(
      Seq((hours.last + 3600000000L, "tGhost", 5L)), 3L)
    unk2 shouldBe 1L
    snaps2 shouldBe snaps
  }

  test("a TOTAL feed outage is densified: skipped hours fold cnt=0 " +
      "for every type once the feed resumes, driving the DOWN detector") {
    val hourU = 3600000000L
    // reference: 10/hour over a 24-hour window, T = 140 (14 live hours)
    val ref = CusumStreams.CusumRef(24L, Map("tLive" -> 140L))
    val fold = new CusumStreams.CusumFold(ref)
    // hours 0..9 live at 10/hour, 10..19 SILENT (no rows at all),
    // 20..23 live again — d = 10·24−140 = 100 live, −140 dead
    fold.fold((0 until 10).map(h => (h * hourU, "tLive", 10L)), 0L)
    val (snaps, _) = fold.fold(
      (20 until 24).map(h => (h * hourU, "tLive", 10L)), 1L)
    val s = snaps.head
    s.n_hours shouldBe 24L            // the 10 silent hours were folded
    s.down_u shouldBe 1400L           // smax 1000 (h9) − smin −400 (h19)
    s.down_from_hour shouldBe 9L * hourU
    s.up_u shouldBe 900L              // the pre-outage climb
    s.up_from_hour shouldBe 19L * hourU
  }

  test("a planted sustained shift alarms MID-stream through the " +
      "monitor wiring, before the window closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // reference: 10/hour over 48 hours
    val ref = CusumStreams.CusumRef(48L, Map("t" -> 480L))
    val hourU = 3600000000L
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Seq[CusumStreams.CusumSnapshot], Long)]
    val q = CusumStreams.monitor(
      mem.toDF().toDF("hour_micros", "event_type", "cnt"), ref,
      (s, u, _) => seen.synchronized { seen += ((s, u)) })
    try {
      // batch 1: 12 on-rate hours — the walk stays flat
      mem.addData((0 until 12).map(h => (h * hourU, "t", 10L)))
      q.processAllAvailable()
      // batch 2: 12 hours at 13/hour — individually unremarkable
      // (+30%), cumulatively undeniable: 12 · (13·48 − 480) = 1728
      mem.addData((12 until 24).map(h => (h * hourU, "t", 13L)))
      q.processAllAvailable()
    } finally q.stop()
    seen.synchronized {
      seen(0)._1.head.up_u shouldBe 0L     // on-rate prefix: silent
      val s = seen(1)._1.head
      s.up_u shouldBe 1728L                // alarms with 24 h still to go
      s.up_from_hour shouldBe 11L * hourU  // the rise begins after h11
    }
  }
}
