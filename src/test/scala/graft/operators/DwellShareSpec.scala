package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q207: dwell-time attribution. One planted session with known gaps:
  * each gap attributes to its FROM event, the session's last event
  * dwells nothing, and shares are exact micro rationals of total
  * attributed seconds. */
class DwellShareSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)

  test("gaps attribute to the FROM event; exact means and shares") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dwell_").toString
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(60), 1L, "view"),
      (3L, ts(90), 1L, "click"), (4L, ts(300), 1L, "purchase"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q207_dwell_share")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    // view: gaps 60 + 30 = 90 s over 2 dwells; click: 210 s over 1;
    // purchase (terminal) attributes nothing. total = 300 s.
    got.toSeq shouldBe Seq(
      ("click", 1L, 210L, 210000000L, 700000L),
      ("view", 2L, 90L, 45000000L, 300000L))
  }
}
