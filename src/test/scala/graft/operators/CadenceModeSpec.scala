package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q201's production mode: `spark.graft.cadence.mode = segmented`
  * computes gaps within (type, UTC day) — dropping exactly the
  * midnight-boundary gaps the scaladoc prices — so a feed's sort never
  * concentrates a whole type in one partition. The spec pins the
  * exact-vs-segmented delta on a planted cross-midnight feed, and the
  * loud rejection of a typo'd mode. */
class CadenceModeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)

  test("segmented drops exactly the midnight gap; exact keeps it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cadmode_").toString
    // Four events 8 h apart: gaps 28800×3 exact; the third event sits
    // at 16:00 day 0 and the fourth at 00:00 day 1 — the segmented
    // form opens a new day partition there and drops that gap.
    val rows = (0L until 4L).map(i => (i + 1L, ts(i * 28800L), 1L, "click"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    def run(): (Long, Long, Long) = {
      val r = SparkEntry.queries("q201_cadence_cv")(spark, dir).collect().head
      (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    run() shouldBe ((3L, 28800000000L, 0L)) // exact: 3 equal gaps, CV 0

    spark.conf.set(Events.CadenceModeConf, "segmented")
    try {
      run() shouldBe ((2L, 28800000000L, 0L)) // midnight gap dropped
    } finally spark.conf.unset(Events.CadenceModeConf)

    spark.conf.set(Events.CadenceModeConf, "weekly")
    try {
      val e = intercept[IllegalArgumentException] { run() }
      e.getMessage should include(Events.CadenceModeConf)
    } finally spark.conf.unset(Events.CadenceModeConf)

    // ONE conf moves BOTH cadence readers: the q223 tail table drops
    // the same midnight gap under segmented mode (a split-brain gap
    // definition between the CV and its tails would be worse than
    // either mode).
    def tails(): (Long, Long) = {
      val rows = SparkEntry.queries("q223_gap_tail_quantiles")(spark, dir)
        .collect()
      (rows.head.getLong(3), rows.map(_.getLong(2)).max)
    }
    tails() shouldBe ((3L, 28800L)) // exact: 3 gaps, max 28800 s
    spark.conf.set(Events.CadenceModeConf, "segmented")
    try {
      tails() shouldBe ((2L, 28800L)) // midnight gap dropped here too
    } finally spark.conf.unset(Events.CadenceModeConf)
  }
}
