package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q191/q192: the sequential-structure pair. A hand-planted event log
  * pins the transition kernel exactly (including a branching row-
  * conditional split) and the session entry-type report exactly
  * (entry = the gap-opening row, conversion, depth, duration). */
class EventSequenceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Base = 1700000000000L

  private def at(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  private def write(dir: String,
      rows: Seq[(Long, Timestamp, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q191: planted chains read the exact kernel — deterministic " +
      "loops at p=1, a 2:1 branch at exact thirds") {
    val dir = Files.createTempDirectory("trans_").toString
    write(dir,
      // user 1: A B A B A  → A→B ×2, B→A ×2
      Seq((1L, at(0), 1L, "A"), (2L, at(1), 1L, "B"), (3L, at(2), 1L, "A"),
        (4L, at(3), 1L, "B"), (5L, at(4), 1L, "A")) ++
      // user 2: C C C      → C→C ×2 (the bot self-loop signature)
      Seq((6L, at(0), 2L, "C"), (7L, at(1), 2L, "C"), (8L, at(2), 2L, "C")) ++
      // user 3: A C        → the branch: from A, B twice vs C once
      Seq((9L, at(0), 3L, "A"), (10L, at(1), 3L, "C")))

    val got = SparkEntry.queries("q191_event_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    got(("A", "B")) shouldBe ((2L, 3L, 666666L))
    got(("A", "C")) shouldBe ((1L, 3L, 333333L))
    got(("B", "A")) shouldBe ((2L, 2L, 1000000L))
    got(("C", "C")) shouldBe ((2L, 2L, 1000000L))
    got.keySet shouldBe Set(("A", "B"), ("A", "C"), ("B", "A"), ("C", "C"))
  }

  test("q192: the entry row is the gap-opener; depth, duration, and " +
      "conversion aggregate exactly per entry type") {
    val dir = Files.createTempDirectory("entry_").toString
    write(dir,
      // user 1, session 1 (entry view, converts, 2 min, depth 3)
      Seq((1L, at(0), 1L, "view"), (2L, at(1), 1L, "click"),
        (3L, at(2), 1L, "purchase")) ++
      // user 1, session 2 after a 2 h gap (entry click, depth 1)
      Seq((4L, at(122), 1L, "click")) ++
      // user 2, one session (entry view, 1 min, depth 2)
      Seq((5L, at(0), 2L, "view"), (6L, at(1), 2L, "view")))

    val got = SparkEntry.queries("q192_entry_sessions")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // n_sessions, depth_u, avg_dur_s, n_converted, conversion_u
    got("view") shouldBe ((2L, 2500000L, 90L, 1L, 500000L))
    got("click") shouldBe ((1L, 1000000L, 0L, 0L, 0L))
    got.keySet shouldBe Set("view", "click")
    // ordering: traffic-first
    SparkEntry.queries("q192_entry_sessions")(spark, dir)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("view", "click")
  }
}
