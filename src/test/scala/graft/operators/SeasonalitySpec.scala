package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q199: lag-24 autocorrelation over the DENSE hour grid. Planted 72-hour
  * feeds: a diurnal spike train reads exactly +1, a 48-hour-period
  * square wave reads exactly −1 (its silent day exists only through
  * densification — missing hours MUST fold 0 for the pairing to be
  * positional in time), and a flat feed reads the 0 variance guard. */
class SeasonalitySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(h: Long, mm: Long = 0L): Timestamp =
    new Timestamp(1704067200000L + h * 3600000L + mm * 60000L)

  test("diurnal +1, anti-phase −1, flat 0 — exact over the dense grid") {
    import spark.implicits._
    val dir = Files.createTempDirectory("season_").toString
    var id = 0L
    def ev(h: Long, e: String, n: Int, mm: Long = 0L) =
      (0 until n).map { _ => id += 1; (id, ts(h, mm), id % 7L, e) }
    val rows =
      // flat: one event every hour of the 72-hour span (also anchors
      // the grid's min/max hours)
      (0L until 72L).flatMap(h => ev(h, "view", 1)) ++
      // diurnal: a spike at the same hour-of-day each day
      Seq(0L, 24L, 48L).flatMap(h => ev(h, "click", 2, mm = 1)) ++
      // anti: on for day 1, silent day 2 (densified zeros), on day 3
      ((0L until 24L) ++ (48L until 72L)).flatMap(h => ev(h, "purchase", 2, mm = 2))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q199_seasonality")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    got.toSet shouldBe Set(
      ("click", 48L, 1000000L),     // spikes align with themselves
      ("view", 48L, 0L),            // flat: zero variance guard
      ("purchase", 48L, -1000000L)) // day-on/day-off: perfect anti-phase
    // ordering is correlation-first
    got.map(_._1).toSeq shouldBe Seq("click", "view", "purchase")
  }
}
