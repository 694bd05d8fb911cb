package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q208: entry→exit matrix. Planted sessions pin the struct-ordered
  * entry/exit selection, the single-event bounce (entry = exit by
  * construction), and the exact micro bounce rate. */
class EntryExitSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(m: Long): Timestamp = new Timestamp(1704067200000L + m * 60000L)

  test("entry/exit per session, bounces, exact rates, count-first order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("entryexit_").toString
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(0), 2L, "view"),                       // bounce
      (4L, ts(0), 3L, "view"),                       // bounce
      (5L, ts(0), 4L, "click"), (6L, ts(2), 4L, "purchase"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q208_entry_exit")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    got.toSeq shouldBe Seq(
      ("view", "view", 2L, 2L, 1000000L),
      ("click", "purchase", 1L, 0L, 0L),
      ("view", "click", 1L, 0L, 0L))
  }
}
