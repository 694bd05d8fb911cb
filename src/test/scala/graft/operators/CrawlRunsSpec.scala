package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q180: crawl-run duplication. Pins the property that distinguishes
  * it from the global dup audits — only ADJACENT identical documents
  * (in ingest-id order, per source) form runs: a planted 4-run and
  * 2-run are counted and measured exactly, a clean source reads zero,
  * and SCATTERED duplicates (same text, non-adjacent) do NOT count —
  * that's q45's business, not a crawler loop. */
class CrawlRunsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("adjacent runs counted exactly; scattered dups and clean " +
      "sources read zero") {
    val docs =
      // sLoop: ids 0..9; ids 2-5 identical (run of 4), ids 7-8
      // identical (run of 2) → 2 runs, 6 docs in runs, max 4.
      (0L to 9L).map { i =>
        val text =
          if (i >= 2 && i <= 5) "stuck template page"
          else if (i == 7 || i == 8) "retry body"
          else s"unique loop $i"
        (i, "sLoop", text)
      } ++
        // sClean: all distinct
        (20L to 24L).map(i => (i, "sClean", s"clean $i")) ++
        // sScatter: ids 30 and 32 identical but separated by 31
        Seq((30L, "sScatter", "dup body"), (31L, "sScatter", "between"),
          (32L, "sScatter", "dup body"))
    val dir = Files.createTempDirectory("runs_").toString
    write(dir, docs)

    val got = SparkEntry.queries("q180_crawl_runs")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    got("sLoop") shouldBe ((10L, 2L, 6L, 4L, 600000L))
    got("sClean") shouldBe ((5L, 0L, 0L, 1L, 0L))
    got("sScatter") shouldBe ((3L, 0L, 0L, 1L, 0L))
  }
}
