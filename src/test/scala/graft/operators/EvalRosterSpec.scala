package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Quota and determinism pins for the q127 stratified eval roster: a
  * small feed keeps ALL its docs (quota is a cap, not a target), a big
  * feed contributes exactly the quota, ranks are contiguous from 1, and
  * two runs produce the identical roster — plus content rotation: when
  * a selected document's text changes, the roster re-selects
  * deterministically rather than keeping the stale exemplar.
  */
class EvalRosterSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, texts: Map[Long, String]): Unit = {
    import spark.implicits._
    val rows = (0L until 13L).map { i =>
      val src = if (i < 3) "src_small" else "src_big"
      val text = texts.getOrElse(i, s"document number $i body text")
      (i, text, "en", src, text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("quota cap, contiguous ranks, run-to-run determinism, " +
      "content rotation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("roster_").toString
    write(dir, Map.empty)

    def roster() = SparkEntry.queries("q127_eval_roster")(spark, dir)
      .select("source", "rnk", "doc_id")
      .as[(String, Long, Long)].collect().toSeq.sorted

    val r1 = roster()
    // a 3-doc feed keeps all 3; a 10-doc feed contributes exactly 5
    r1.count(_._1 == "src_small") shouldBe 3
    r1.count(_._1 == "src_big") shouldBe 5
    // ranks contiguous from 1 within each source
    r1.filter(_._1 == "src_small").map(_._2).sorted shouldBe Seq(1L, 2L, 3L)
    r1.filter(_._1 == "src_big").map(_._2).sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    // deterministic across runs
    roster() shouldBe r1

    // rotate one SELECTED big-feed doc's content: the roster stays
    // quota-sized and is re-derived (the stale exemplar is not pinned)
    val selectedBig = r1.filter(_._1 == "src_big").map(_._3).head
    write(dir, Map(selectedBig -> "entirely rewritten content after recrawl"))
    val r2 = SparkEntry.queries("q127_eval_roster")(spark, dir)
      .select("source", "rnk", "doc_id")
      .as[(String, Long, Long)].collect().toSeq.sorted
    r2.count(_._1 == "src_big") shouldBe 5
    r2.count(_._1 == "src_small") shouldBe 3
  }
}
