package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q200: autocorrelation over the lag set. The planted 72-hour feeds
  * make the lag STRUCTURE diagnostic: a diurnal spike train reads
  * exactly +1 at lags 24 and 48 (the echo), a 48-hour square wave
  * reads −1 at 24 but hits the zero-variance guard at 48 (its pairs
  * are constant), and a flat feed guards to 0 at every lag. */
class PeriodScanSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(h: Long, mm: Long = 0L): Timestamp =
    new Timestamp(1704067200000L + h * 3600000L + mm * 60000L)

  test("diurnal echo at 24/48, square-wave −1 then guard, flat 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("period_").toString
    var id = 0L
    def ev(h: Long, e: String, n: Int, mm: Long = 0L) =
      (0 until n).map { _ => id += 1; (id, ts(h, mm), id % 7L, e) }
    val rows =
      (0L until 72L).flatMap(h => ev(h, "view", 1)) ++
      Seq(0L, 24L, 48L).flatMap(h => ev(h, "click", 2, mm = 1)) ++
      ((0L until 24L) ++ (48L until 72L)).flatMap(h => ev(h, "purchase", 2, mm = 2))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q200_period_scan")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap

    got.size shouldBe 21 // 3 types × 7 lags
    got(("click", 24L)) shouldBe 1000000L
    got(("click", 48L)) shouldBe 1000000L
    got(("click", 1L)) should be < 0L // spikes are never adjacent
    got(("purchase", 24L)) shouldBe -1000000L
    // at lag 48 the square wave pairs day 1 with day 3 — both ON, a
    // CONSTANT pair series, so the zero-variance guard fires
    got(("purchase", 48L)) shouldBe 0L
    Seq(1L, 2L, 3L, 6L, 12L, 24L, 48L).foreach { l =>
      got(("view", l)) shouldBe 0L
    }
  }
}
