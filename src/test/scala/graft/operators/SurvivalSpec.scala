package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q194: Nelson–Aalen retention curve with right-censoring. Hand-planted
  * lifetimes: two observed churns (days 0 and 2), two censored users
  * whose last events fall inside the 7-day censor window — censored
  * users hold every risk set up to their lifetime but never count as
  * churn, and the cumulative hazard is an exact micro rational. */
class SurvivalSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val day = 86400L * 1000L // ms

  private def ts(d: Long, hh: Long = 0L): Timestamp =
    new Timestamp(1704067200000L + d * day + hh * 3600L * 1000L)

  test("censoring-aware risk sets and exact cumulative hazard") {
    import spark.implicits._
    val dir = Files.createTempDirectory("survival_").toString
    // user 3 defines the observation end W at day 20; censor window is
    // 7 days, so lifetimes ending after day 13 are censored.
    val ev = Seq(
      (1L, ts(0), 1L), (2L, ts(2), 1L),          // churn at life_day 2
      (3L, ts(0), 2L),                            // churn at life_day 0
      (4L, ts(0), 3L), (5L, ts(20), 3L),          // censored, life 20
      (6L, ts(0), 4L), (7L, ts(15), 4L))          // censored, life 15
    ev.map { case (id, t, u) => (id, t, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val rows = SparkEntry.queries("q194_survival")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    // (n_risk, n_churn, n_censored, hazard_u, cumhaz_u)
    rows(0L) shouldBe ((4L, 1L, 0L, 250000L, 250000L))
    rows(2L) shouldBe ((3L, 1L, 0L, 333333L, 583333L))
    rows(15L) shouldBe ((2L, 0L, 1L, 0L, 583333L))
    rows(20L) shouldBe ((1L, 0L, 1L, 0L, 583333L))
    rows.keySet shouldBe Set(0L, 2L, 15L, 20L)
  }
}
