package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q152's robustness claim is the test: a planted 1000× fat-finger
  * value must be the ONLY outlier (median/MAD barely move), the
  * even-count type exercises the interpolated median exactly, and
  * every reported int is hand-computed. */
class MadOutliersSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("fat-finger event is the single outlier; interpolated medians " +
      "are exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mad_").toString
    // pay: 1..10 plus one 1000.0 fat-finger -> median 6, MAD 3
    // tiny: 1..4 (even count) -> median 2.5, MAD 1
    val rows =
      (1 to 10).map(i => (i.toLong, 1L, "pay", i.toDouble)) ++
        Seq((11L, 2L, "pay", 1000.0)) ++
        (1 to 4).map(i => (20L + i, 3L, "tiny", i.toDouble))
    rows.zipWithIndex.map { case ((id, u, et, v), i) =>
      (id, ts(i * 10L), u, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q152_mad_outliers")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    //                  n    med_u  mad_mu   n_out  max_dev_u
    got("pay") shouldBe ((11L, 6000L, 3000000L, 1L, 994000L))
    got("tiny") shouldBe ((4L, 2500L, 1000000L, 0L, 1500L))
    got.keySet shouldBe Set("pay", "tiny")
  }
}
