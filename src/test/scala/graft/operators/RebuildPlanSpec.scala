package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q165's verdict table, planted so every mode fires — including the
  * inclusive 20% boundary, which must still read `delta`: a source with
  * zero churn skips, a source at exactly 1-in-5 churn delta-merges with
  * the work-list priced at exactly its delta, and a mostly-new source
  * rebuilds at its full current size. */
class RebuildPlanSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("skip / delta (inclusive boundary) / full verdicts with exact " +
      "churn and work estimates") {
    import spark.implicits._
    // q159's stored-ledger rule: doc_id % 10 == 0 → added since the
    // snapshot; % 7 == 0 (and % 10 != 0) → changed. ids are chosen per
    // source to force each verdict.
    val rows = Seq(
      // sSkip: both ids avoid % 10 == 0 and % 7 == 0 → all unchanged
      (11L, "sSkip"), (13L, "sSkip"),
      // sDelta: 4 unchanged + 1 added = churn exactly 200000 (20%)
      (101L, "sDelta"), (102L, "sDelta"), (103L, "sDelta"),
      (104L, "sDelta"), (110L, "sDelta"),
      // sFull: 1 unchanged + 1 changed (217 = 7·31) + 1 added (220)
      (201L, "sFull"), (217L, "sFull"), (220L, "sFull"))
    val dir = Files.createTempDirectory("rebuild_").toString
    rows.map { case (id, src) =>
      (id, s"text of $id", "en", src, s"text of $id".length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q165_rebuild_plan")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7), r.getLong(8)))).toMap

    //                 added changed removed unchanged cur churn  mode  work
    got("sSkip") shouldBe ((0L, 0L, 0L, 2L, 2L, 0L, "skip", 0L))
    got("sDelta") shouldBe ((1L, 0L, 0L, 4L, 5L, 200000L, "delta", 1L))
    got("sFull") shouldBe ((1L, 1L, 0L, 1L, 3L, 666666L, "full", 3L))
  }
}
