package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q149 is support counting over per-user DISTINCT type sets: repeat
  * events must not inflate support, each unordered pair appears once
  * (ta < tb), and the attached n_a/n_b are the per-type user reach —
  * all hand-checkable on a planted four-user log. */
class EventPairsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("pair support counts users, not events; reach columns match") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evpairs_").toString
    // u1: {view, click}            (click repeated — still one user)
    // u2: {view, click, purchase}
    // u3: {view}
    // u4: {purchase}
    val rows = Seq(
      (0L, 1L, "view"), (1L, 1L, "click"), (2L, 1L, "click"),
      (3L, 2L, "view"), (4L, 2L, "click"), (5L, 2L, "purchase"),
      (6L, 3L, "view"),
      (7L, 4L, "purchase"))
    rows.map { case (id, u, et) => (id, ts(id * 10), u, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q149_event_pairs")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // supports: (click,view)=2, (click,purchase)=1, (purchase,view)=1
    got(("click", "view")) shouldBe ((2L, 2L, 3L))
    got(("click", "purchase")) shouldBe ((1L, 2L, 2L))
    got(("purchase", "view")) shouldBe ((1L, 2L, 3L))
    got.keySet shouldBe Set(
      ("click", "view"), ("click", "purchase"), ("purchase", "view"))
  }
}
