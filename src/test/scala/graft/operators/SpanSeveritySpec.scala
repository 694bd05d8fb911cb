package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-severity fixture for the q132 verbatim-span metric: a doc
  * embedding a 20-word contiguous benchmark passage must report exactly
  * a 13-window run (longest span = 20 words), while a doc with two
  * SCATTERED 8-word copies reports two singleton runs (longest span =
  * 8) — hit counts alone could not separate them at 13 vs 2, but the
  * severity order is the passage, not the phrase pair.
  */
class SpanSeveritySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("contiguous passage vs scattered phrases: run lengths exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("spansev_").toString

    val eval = (1 to 30).map(i => s"e$i")              // doc 0: the benchmark
    // doc 1: 20-word verbatim passage e5..e24 inside unique filler
    val passage = (1 to 6).map(i => s"fa$i") ++ eval.slice(4, 24) ++
      (1 to 6).map(i => s"fb$i")
    // doc 2: two scattered exact-8-word copies, separated by filler
    val scattered = (1 to 5).map(i => s"fc$i") ++ eval.slice(0, 8) ++
      (1 to 5).map(i => s"fd$i") ++ eval.slice(19, 27) ++
      (1 to 5).map(i => s"fe$i")
    // doc 3: clean control
    val clean = (1 to 20).map(i => s"ff$i")

    val rows = Seq(
      (0L, eval.mkString(" ")),      // eval slice (0 % 17 == 0)
      (1L, passage.mkString(" ")),
      (2L, scattered.mkString(" ")),
      (3L, clean.mkString(" ")))
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q132_span_severity")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // 20-word passage => 13 consecutive hit windows, longest span 20
    out(1L) shouldBe ((13L, 13L, 20L))
    // two scattered 8-word copies => two singleton runs, longest span 8
    out(2L) shouldBe ((2L, 1L, 8L))
    // the clean doc does not appear
    out.keySet shouldBe Set(1L, 2L)
  }

  test("on the fixture corpus severity reconciles with q118's hit counts") {
    import spark.implicits._
    // Σ run lengths counts hit POSITIONS = q118's occurrence count
    // (NOT its distinct-hash n_hit_windows — a doc repeating one hit
    // 8-gram at two positions has 2 occurrences, 1 distinct hash).
    val sev = SparkEntry.queries("q132_span_severity")(spark, SparkSpec.Sf0001)
      .select("doc_id", "n_hit_occurrences").as[(Long, Long)].collect().toMap
    val gate = SparkEntry.queries("q118_span_decontamination")(
        spark, SparkSpec.Sf0001)
      .select("doc_id", "n_hit_occurrences").as[(Long, Long)].collect().toMap
    sev shouldBe gate
  }

  test("a doc repeating ONE hit 8-gram at two positions: occurrences 2, " +
      "q118 distinct windows 1 — the column-semantics distinction pinned") {
    import spark.implicits._
    val dir = Files.createTempDirectory("spansev_rep_").toString
    val eval = (1 to 10).map(i => s"e$i")
    // the same 8-word eval window e1..e8 at two separated positions
    val repeater = eval.slice(0, 8) ++ (1 to 5).map(i => s"fg$i") ++
      eval.slice(0, 8)
    Seq((0L, eval.mkString(" ")), (1L, repeater.mkString(" ")))
      .map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val sev = SparkEntry.queries("q132_span_severity")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    sev(1L) shouldBe ((2L, 1L, 8L)) // two occurrences, singleton runs
    val gate = SparkEntry.queries("q118_span_decontamination")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4)))).toMap
    gate(1L) shouldBe ((1L, 2L)) // 1 distinct window hash, 2 occurrences
  }
}
