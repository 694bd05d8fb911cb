package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q156's journey semantics, hand-planted: journeys split at purchase
  * boundaries, only converting journeys credit their touches, the
  * three models (first/last/linear) score exactly, touch-less
  * conversions land in '(none)', and a trailing unconverted journey
  * credits nobody. */
class AttributionSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("planted journeys: first/last/linear credits exact, (none) and " +
      "unconverted tails handled") {
    import spark.implicits._
    val dir = Files.createTempDirectory("attrib_").toString
    val rows = Seq(
      // u1 journey 0: view → click → purchase
      //   first=view, last=click, linear 500000 each
      (0L, 10L, 1L, "view"), (1L, 20L, 1L, "click"),
      (2L, 30L, 1L, "purchase"),
      // u1 journey 1: error → purchase — first=last=error, linear 1e6
      (3L, 40L, 1L, "error"), (4L, 50L, 1L, "purchase"),
      // u1 journey 2: back-to-back purchase, zero touches → (none)
      (5L, 60L, 1L, "purchase"),
      // u1 journey 3: trailing view, never converts → no credit at all
      (6L, 70L, 1L, "view"),
      // u2: purchase as the first-ever event → (none)
      (7L, 15L, 2L, "purchase"),
      // u2 journey 1: click → view → view → purchase
      //   first=click, last=view, linear: click 333333, views 2×333333
      (8L, 25L, 2L, "click"), (9L, 35L, 2L, "view"),
      (10L, 45L, 2L, "view"), (11L, 55L, 2L, "purchase"))
    rows.map { case (id, t, u, et) => (id, ts(t), u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q156_touch_attribution")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // view: first in u1-j0, last in u2-j1; click: first in u2-j1,
    // last (the closer) in u1-j0
    got("view") shouldBe ((1L, 1L, 500000L + 2L * 333333L))
    got("click") shouldBe ((1L, 1L, 500000L + 333333L))
    got("error") shouldBe ((1L, 1L, 1000000L))
    got("(none)") shouldBe ((2L, 2L, 2000000L))
    got.keySet shouldBe Set("view", "click", "error", "(none)")

    // every conversion is accounted for exactly once in each model
    val purchases = rows.count(_._4 == "purchase").toLong
    got.values.map(_._1).sum shouldBe purchases
    got.values.map(_._2).sum shouldBe purchases
  }
}
