package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q203: strict-order in-session funnel. The planted sessions pin the
  * ordering semantics hard: a purchase BEFORE the session's first view
  * must not count as step 3, and a session with no view contributes to
  * the base but reaches no step. */
class SessionFunnelSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(m: Long): Timestamp = new Timestamp(1704067200000L + m * 60000L)

  test("in-order completes; out-of-order purchase does not count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("funnel_").toString
    val rows = Seq(
      // user 1: view → click → purchase (completes)
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(2), 1L, "purchase"),
      // user 2: purchase → view → click (purchase precedes the view:
      // steps 1 and 2 only)
      (4L, ts(0), 2L, "purchase"), (5L, ts(1), 2L, "view"),
      (6L, ts(2), 2L, "click"),
      // user 3: click → purchase (no view at all: base only)
      (7L, ts(0), 3L, "click"), (8L, ts(1), 3L, "purchase"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q203_session_funnel")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    got.toSeq shouldBe Seq(
      (1L, "view", 2L, 3L, 666666L),
      (2L, "view>click", 2L, 3L, 666666L),
      (3L, "view>click>purchase", 1L, 3L, 333333L))
  }
}
