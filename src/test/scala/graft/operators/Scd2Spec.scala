package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q145's intervals must be exactly the compressed change log: a
  * planted per-user run sequence produces the hand-written version
  * table (runs compress, ties order by event_id, the last version is
  * open), and on the fixture corpus the output is a well-formed SCD2
  * dimension — per user: contiguous version numbers, abutting
  * intervals (valid_to == next valid_from), exactly one open current
  * version. */
class Scd2Spec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("planted run sequence compresses to the hand-written versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scd2_").toString
    // user 1: view view click click view  -> 3 versions
    // user 2: error                        -> 1 open version
    // user 3 ties: two events at t=100 — event_id breaks the tie.
    val rows = Seq(
      (0L, ts(10), 1, "view"), (1L, ts(20), 1, "view"),
      (2L, ts(30), 1, "click"), (3L, ts(40), 1, "click"),
      (4L, ts(50), 1, "view"),
      (5L, ts(60), 2, "error"),
      (6L, ts(100), 3, "b_type"), (7L, ts(100), 3, "a_type"))
    rows.map { case (id, t, u, et) => (id, t, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q145_scd2_intervals")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    def us(s: Long) = s * 1000000L
    got.filter(_._1 == 1) shouldBe Array(
      (1, 1L, "view", us(10), us(30), false),
      (1, 2L, "click", us(30), us(50), false),
      (1, 3L, "view", us(50), -1L, true))
    got.filter(_._1 == 2) shouldBe Array((2, 1L, "error", us(60), -1L, true))
    // tie at t=100: event_id 6 ("b_type") precedes 7 ("a_type")
    got.filter(_._1 == 3) shouldBe Array(
      (3, 1L, "b_type", us(100), us(100), false),
      (3, 2L, "a_type", us(100), -1L, true))
  }

  test("q147 attributes each purchase to the state active strictly " +
      "before it; a first-ever purchase lands in 'none'") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scd2attr_").toString
    // user 1: view@10 view@20 click@30 purchase@40 purchase@50 view@60
    //   intervals: view[10,30) click[30,40) purchase[40,60) view[60,∞)
    //   purchase@40 starts its own run ⇒ attributes to 'click';
    //   purchase@50 sits inside the purchase run ⇒ 'purchase'.
    // user 2: purchase@100 is the first-ever event ⇒ 'none'.
    val rows = Seq(
      (0L, ts(10), 1, "view"), (1L, ts(20), 1, "view"),
      (2L, ts(30), 1, "click"), (3L, ts(40), 1, "purchase"),
      (4L, ts(50), 1, "purchase"), (5L, ts(60), 1, "view"),
      (6L, ts(100), 2, "purchase"))
    rows.map { case (id, t, u, et) => (id, t, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q147_state_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    got shouldBe Map(
      "click" -> ((1L, 1L)),
      "purchase" -> ((1L, 1L)),
      "none" -> ((1L, 1L)))
  }

  test("q148 incremental merge equals the full rebuild across every " +
      "boundary case: straddling run, delta close, new user, untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("scd2inc_").toString
    // Engine cutoff = min + 4/5·span = 10 + 4/5·90 = 82 ⇒ delta: ts ≥ 82.
    // user 1: view@10 view@90        — run straddles the cut, no new version
    // user 2: click@20 error@85      — delta closes the stored open interval
    // user 3: signup@95              — brand-new user, delta only
    // user 4: view@30 click@40       — history only, untouched pass-through
    // user 5: view@50 view@82 click@100 — boundary event exactly AT the cut
    val rows = Seq(
      (0L, ts(10), 1, "view"), (1L, ts(90), 1, "view"),
      (2L, ts(20), 2, "click"), (3L, ts(85), 2, "error"),
      (4L, ts(95), 3, "signup"),
      (5L, ts(30), 4, "view"), (6L, ts(40), 4, "click"),
      (7L, ts(50), 5, "view"), (8L, ts(82), 5, "view"),
      (9L, ts(100), 5, "click"))
    rows.map { case (id, t, u, et) => (id, t, u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val full = SparkEntry.queries("q145_scd2_intervals")(spark, dir)
      .collect().map(_.toSeq)
    val inc = SparkEntry.queries("q148_scd2_incremental")(spark, dir)
      .collect().map(_.toSeq)
    inc shouldBe full
  }

  test("fixture corpus: contiguous versions, abutting intervals, one " +
      "open current version per user") {
    val rows = SparkEntry.queries("q145_scd2_intervals")(
        spark, SparkSpec.Sf0001)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5)))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      sorted.map(_._2) shouldBe (1L to vs.length.toLong).toArray
      sorted.count(_._5) shouldBe 1
      sorted.last._5 shouldBe true
      sorted.sliding(2).foreach {
        case Array(a, b) => a._4 shouldBe b._3 // valid_to == next valid_from
        case _ =>
      }
    }
  }
}
