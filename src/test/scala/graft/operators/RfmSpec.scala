package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q150's quartiles are NTILE(4) under a total (metric desc, user_id)
  * order, so a planted eight-user purchase log with strictly ordered
  * metrics has a hand-computable cube; the approx mode (the q106/q109
  * quantile-threshold switch) must preserve the user total and the
  * quartile range without any global window. */
class RfmSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def fixture(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("rfm_").toString
    // Users 1..8: user u purchases u times (frequency rank = reverse of
    // u), last purchase at t=1000+u (recency rank = reverse of u too),
    // each purchase worth u dollars (monetary = u^2, same ordering).
    // All three metrics order users 8,7,...,1 ⇒ every user lands in the
    // SAME quartile on all three axes: {8,7}→1, {6,5}→2, {4,3}→3,
    // {2,1}→4 — the cube is four diagonal cells of two users each.
    val rows = for {
      u <- 1L to 8L
      k <- 1L to u
    } yield (u * 100L + k, ts(1000L + u - (u - k) * 2), u,
      "purchase", u.toDouble, "{}")
    val noise = Seq((9999L, ts(5L), 1L, "view", 99.0, "{}"))
    (rows ++ noise)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("planted monotone metrics produce the four diagonal cells") {
    val dir = fixture()
    val got = SparkEntry.queries("q150_rfm_segments")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4))))
      .toMap
    got.keySet shouldBe Set((1L, 1L, 1L), (2L, 2L, 2L),
      (3L, 3L, 3L), (4L, 4L, 4L))
    // spend of cell 1 = users 8 and 7 = 64 + 49
    got((1L, 1L, 1L)) shouldBe ((2L, 113.0))
    got((4L, 4L, 4L)) shouldBe ((2L, 5.0)) // users 2 and 1: 4 + 1
  }

  test("approx mode keeps the user total and quartile range with no " +
      "global window") {
    val dir = fixture()
    spark.conf.set(Features.QuantileModeConf, "approx")
    try {
      val rows = SparkEntry.queries("q150_rfm_segments")(spark, dir)
        .collect()
      rows.map(_.getLong(3)).sum shouldBe 8L
      all(rows.map(_.getLong(0))) should (be >= 1L and be <= 4L)
      all(rows.map(_.getLong(1))) should (be >= 1L and be <= 4L)
      all(rows.map(_.getLong(2))) should (be >= 1L and be <= 4L)
    } finally spark.conf.unset(Features.QuantileModeConf)
  }
}
