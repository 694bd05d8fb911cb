package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q205: sequential pair support. Planted sessions pin the ORDER
  * semantics (first occurrence of a before first occurrence of b),
  * directional asymmetry ((view,click) and (click,view) are different
  * pairs), and the exact confidence denominators. */
class SeqSupportSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(m: Long): Timestamp = new Timestamp(1704067200000L + m * 60000L)

  test("first-occurrence order, directional pairs, exact confidence") {
    import spark.implicits._
    val dir = Files.createTempDirectory("seqsup_").toString
    val rows = Seq(
      // u1: view click view purchase — the repeat view must NOT
      // create a (click,view) pair (first occurrences only)
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(2), 1L, "view"), (4L, ts(3), 1L, "purchase"),
      // u2: click before view — the reverse direction
      (5L, ts(0), 2L, "click"), (6L, ts(1), 2L, "view"),
      // u3: view then click
      (7L, ts(0), 3L, "view"), (8L, ts(1), 3L, "click"))
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q205_seq_support")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    got.toSeq shouldBe Seq(
      ("view", "click", 2L, 3L, 666666L),
      ("click", "purchase", 1L, 3L, 333333L),
      ("click", "view", 1L, 3L, 333333L),
      ("view", "purchase", 1L, 3L, 333333L))

    // the whole session family rides ONE sessionized build: q205's
    // three references plus the funnel/latency/dwell queries must not
    // re-run the corpus window stack.
    SparkEntry.queries("q203_session_funnel")(spark, dir).collect()
    SparkEntry.queries("q206_conversion_latency")(spark, dir).collect()
    SparkEntry.queries("q207_dwell_share")(spark, dir).collect()
    val builds = Features.buildCountsFor(spark)
      .filter { case (k, _) => k == s"$dir#sessionized" }
    builds.values.toSeq shouldBe Seq(1)
  }
}
