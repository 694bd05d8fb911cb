package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q184: exact CUSUM change-point detection. A hand-planted sustained
  * rate shift must be measured exactly — the statistic in event·hours
  * units AND the change-point hour (the argmin of the drift-free walk)
  * — while a perfectly flat type reads exactly 0, and a SPIKE-free
  * sustained shift demonstrates the property the query exists for:
  * every post-shift hour is individually unremarkable, only their
  * accumulated sum alarms. */
class CusumShiftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Base = 1699999200000L // fixed epoch millis, hour-aligned

  private def at(h: Int): Timestamp = new Timestamp(Base + h * 3600000L)

  test("planted sustained shift: exact statistic, exact change hour; " +
      "flat type reads zero") {
    import spark.implicits._
    // 48 hours. tFlat: 10/hour throughout → d = 0 every hour.
    // tShift: 5/hour for hours 0..35, then 20/hour for 36..47.
    // T = 36·5 + 12·20 = 420; H = 48.
    // d = 5·48 − 420 = −180 (pre), 20·48 − 420 = 540 (post);
    // S' declines to −6480 at hour 35, climbs back to exactly 0 —
    // up_u = 0 − (−6480) = 6480, argmin at hour 35 (the shift begins
    // after it). down_u: the running max starts at the FIRST row's
    // s = −180 (not 0 — there is no phantom hour before the window),
    // so max(smax − s) = −180 − (−6480) = 6300.
    val rows =
      (0 until 48).flatMap(h => (0 until 10).map(i =>
        (h * 100L + i, at(h), i.toLong, "tFlat", 1.0, "{}"))) ++
        (0 until 36).flatMap(h => (0 until 5).map(i =>
          (10000L + h * 100L + i, at(h), i.toLong, "tShift", 1.0, "{}"))) ++
        (36 until 48).flatMap(h => (0 until 20).map(i =>
          (20000L + h * 100L + i, at(h), i.toLong, "tShift", 1.0, "{}")))
    val dir = Files.createTempDirectory("cusum_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q184_cusum_shift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getTimestamp(4), r.getLong(5)))).toMap

    // flat walk: every hour ties at 0; the tie-to-LATEST rule dates
    // the (non-)change at the window's end, not hour zero
    got("tFlat") shouldBe ((48L, 480L, 0L, at(47), 0L))
    val (nh, tot, upU, upFrom, downU) = got("tShift")
    nh shouldBe 48L
    tot shouldBe 420L
    upU shouldBe 6480L
    upFrom shouldBe at(35) // the sustained rise begins after hour 35
    downU shouldBe 6300L
    // the shifted type ranks first
    SparkEntry.queries("q184_cusum_shift")(spark, dir)
      .collect().head.getString(0) shouldBe "tShift"
  }

  test("a TOTAL feed outage (hours with no events at all) folds cnt=0 " +
      "for every type: the dense span grid drives the DOWN detector") {
    import spark.implicits._
    // tLive: 10/hour for hours 0..9, NOTHING anywhere for 10..19,
    // 10/hour again for 20..23. Span-dense H = 24, T = 140.
    // d = 10·24 − 140 = 100 live, −140 dead: the walk climbs to 1000
    // (h9), falls to −400 (h19), returns to 0 — up_u = 900 (pre-outage
    // climb, argmin h19), down_u = 1400 (the outage, from h9).
    val rows = ((0 until 10) ++ (20 until 24)).flatMap(h =>
      (0 until 10).map(i =>
        (h * 100L + i, at(h), i.toLong, "tLive", 1.0, "{}")))
    val dir = Files.createTempDirectory("cusum3_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = SparkEntry.queries("q184_cusum_shift")(spark, dir)
      .collect().head
    r.getString(0) shouldBe "tLive"
    r.getLong(1) shouldBe 24L    // n_hours counts the silent hours
    r.getLong(2) shouldBe 140L
    r.getLong(3) shouldBe 900L
    r.getTimestamp(4) shouldBe at(19)
    r.getLong(5) shouldBe 1400L
    r.getTimestamp(6) shouldBe at(9)
  }

  test("a sustained shift alarms where a spike detector sees nothing: " +
      "post-shift hours are each inside the pre-shift range") {
    import spark.implicits._
    // tCreep: alternates 9/11 per hour for 36 hours (range [9, 11]),
    // then 11 EVERY hour — each post-shift hour equals the prior MAX,
    // individually unremarkable; the accumulated walk still rises.
    val pre = (0 until 36).flatMap(h =>
      (0 until (if (h % 2 == 0) 9 else 11)).map(i =>
        (h * 100L + i, at(h), i.toLong, "tCreep", 1.0, "{}")))
    val post = (36 until 72).flatMap(h =>
      (0 until 11).map(i =>
        (30000L + h * 100L + i, at(h), i.toLong, "tCreep", 1.0, "{}")))
    val dir = Files.createTempDirectory("cusum2_").toString
    (pre ++ post)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = SparkEntry.queries("q184_cusum_shift")(spark, dir)
      .collect().head
    r.getString(0) shouldBe "tCreep"
    // T = 36·10 + 36·11 = 756, H = 72; post-shift d = 11·72 − 756 = 36
    // per hour for 36 hours ⇒ the walk climbs 1296 from its minimum.
    r.getLong(3) should be >= 1296L
    // change-point estimate: the walk's minimum is the LAST 9-count
    // hour — inside the alternating prefix the walk zigzags (−108 on
    // 9-hours, +36 on 11-hours), so the global minimum sits at hour 34
    // (the final even hour) and the sustained rise begins after it.
    r.getTimestamp(4) shouldBe at(34)
  }
}
