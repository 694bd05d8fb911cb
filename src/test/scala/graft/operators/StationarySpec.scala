package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q195: stationary distribution of the q191 kernel. Two planted
  * dynamics: a deterministic 2-cycle whose uniform start is already
  * stationary (pins the exact integer matvec — any arithmetic drift
  * would move it), and a pure-sink chain where the absorbing type ends
  * with ALL the mass and the transient type drops out of the support. */
class StationarySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(m: Long): Timestamp = new Timestamp(1704067200000L + m * 60000L)

  private def write(dir: String, ev: Seq[(Long, Timestamp, Long, String)]): Unit = {
    import spark.implicits._
    ev.map { case (id, t, u, e) => (id, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  test("a deterministic 2-cycle holds the uniform distribution exactly") {
    val dir = Files.createTempDirectory("stationary_").toString
    // click→view→click→view→click: P(click→view)=P(view→click)=1.
    write(dir, Seq((1L, ts(0), 1L, "click"), (2L, ts(1), 1L, "view"),
      (3L, ts(2), 1L, "click"), (4L, ts(3), 1L, "view"),
      (5L, ts(4), 1L, "click")))
    val got = SparkEntry.queries("q195_stationary")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.toSet shouldBe Set(("click", 500000L), ("view", 500000L))
  }

  test("an absorbing sink takes all the mass; the transient type drops out") {
    val dir = Files.createTempDirectory("stationary_").toString
    // user 1: error→error×4 (self-loop p=1); user 2: view→error.
    write(dir, Seq((1L, ts(0), 1L, "error"), (2L, ts(1), 1L, "error"),
      (3L, ts(2), 1L, "error"), (4L, ts(3), 1L, "error"),
      (5L, ts(4), 1L, "error"),
      (6L, ts(0), 2L, "view"), (7L, ts(1), 2L, "error")))
    val got = SparkEntry.queries("q195_stationary")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.toSeq shouldBe Seq(("error", 1000000L))
  }
}
