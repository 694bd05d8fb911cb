package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q201: inter-arrival CV per type. A metronome feed reads exactly 0;
  * the planted bursty feed's variance term is a perfect square
  * (gaps 3,3,3,3,8 → n·Σx²−(Σx)² = 100), so its CV is the exact
  * micro rational 1/2. */
class CadenceCvSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)

  test("metronome 0, perfect-square burst exactly 1/2, burst-first order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cadence_").toString
    var id = 0L
    def ev(s: Long, e: String) = { id += 1; (id, ts(s), 1L, e) }
    val rows =
      (0L until 5L).map(i => ev(i * 60L, "metronome")) ++
      Seq(0L, 3L, 6L, 9L, 12L, 20L).map(s => ev(s, "bursty"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q201_cadence_cv")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))

    // gaps 3,3,3,3,8: Σx=20, Σx²=100, 5·100−400=100, √100/20 = 1/2
    got.head shouldBe ("bursty", (5L, 4000000L, 500000L))
    got(1) shouldBe ("metronome", (4L, 60000000L, 0L))
  }
}
