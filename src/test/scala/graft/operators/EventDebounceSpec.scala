package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q155's debounce reads the gap to the PREVIOUS event per
  * (user, type): redeliveries inside 300 s count, a slower repeat does
  * not, different types never debounce each other, and different users
  * never share a stream — each case planted and hand-counted. */
class EventDebounceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("planted redeliveries: per-type counts and micro-rates exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("debounce_").toString
    val rows = Seq(
      // u1 click chain: 0, +100 (dup), +400-from-prev (not dup: lag
      // gap 300 < 400), +200-from-prev (dup)
      (0L, 0L, 1L, "click"), (1L, 100L, 1L, "click"),
      (2L, 500L, 1L, "click"), (3L, 700L, 1L, "click"),
      // u1 view interleaved at 50 and 350: its OWN stream gap is 300
      // (= the threshold, inclusive → dup); the clicks never see it
      (4L, 50L, 1L, "view"), (5L, 350L, 1L, "view"),
      // u2 click at 120: a different user — no debounce against u1
      (6L, 120L, 2L, "click"),
      // u2 purchase singleton: no predecessor, never a dup
      (7L, 130L, 2L, "purchase"))
    rows.map { case (id, t, u, et) => (id, ts(t), u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q155_event_debounce")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // clicks: 5 events (4 u1 + 1 u2), dups = u1's +100 and +200 gaps
    got("click") shouldBe ((5L, 2L, 400000L))
    // views: gap exactly 300 s is inside the window (<=)
    got("view") shouldBe ((2L, 1L, 500000L))
    got("purchase") shouldBe ((1L, 0L, 0L))
    got.keySet shouldBe Set("click", "view", "purchase")
  }
}
