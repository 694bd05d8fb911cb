package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-leak test for the q118 long-window decontamination gate and
  * the q119 per-source triage built over it: a training document
  * embedding a verbatim 8-word benchmark span is flagged with exact
  * window accounting, a document sharing only a 7-word run is not (the
  * long-window gate's precision is the point), and the triage report
  * reconciles per source against the two gates' own doc sets. */
class SpanDecontamSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(id: Long, src: String, text: String) =
    (id, text, "en", src, text.length.toLong)

  test("verbatim 8-word span flagged with exact window counts; " +
      "7-word overlap is below the gate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("span_decontam_").toString

    val evalSpan = (0 until 8).map(i => s"bench$i").mkString(" ")
    // doc 0 (0 % 17 == 0) is the eval slice; it carries the span.
    val evalDoc = doc(0L, "eval", s"$evalSpan evalpad0 evalpad1 evalpad2")
    // doc 1: embeds the full 8-word span mid-document → exactly one
    // hit window (the full-span window; flanking windows mix pads).
    val leak = doc(1L, "srcA", s"pada0 pada1 $evalSpan pada2 pada3")
    // doc 2: shares only the first 7 benchmark words → zero 8-windows
    // in common.
    val sevenOnly = doc(2L, "srcB",
      "padb0 padb1 " + (0 until 7).map(i => s"bench$i").mkString(" ") +
        " padb2 padb3")
    // doc 3: clean filler.
    val clean = doc(3L, "srcB", (0 until 20).map(i => s"c$i").mkString(" "))

    Seq(evalDoc, leak, sevenOnly, clean)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val flagged = SparkEntry.queries("q118_span_decontamination")(spark, dir)
      .select("doc_id", "n_hit_windows", "n_windows", "min_eval_doc")
      .as[(Long, Long, Long, Long)].collect()
    flagged.map(_._1).toSet shouldBe Set(1L)
    val row = flagged.head
    row._2 shouldBe 1L          // exactly the full-span window
    row._3 shouldBe 5L          // 12 tokens → 5 windows of 8
    row._4 shouldBe 0L          // traced to the eval doc

    // Triage reconciles: srcA 1/1 on the 8-gram gate, srcB 0/2.
    val triage = SparkEntry.queries("q119_contamination_triage")(spark, dir)
      .select("source", "n_docs", "n_8gram")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    triage("srcA") shouldBe ((1L, 1L))
    triage("srcB") shouldBe ((2L, 0L))
  }

  test("on the fixture corpus the triage's gate counts equal the " +
      "gates' own doc sets, and 3-gram fires at least as often as 8-gram") {
    import spark.implicits._
    val dir = SparkSpec.Sf0001
    val srcOf = graft.Tables.documents(spark, dir)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val g3 = SparkEntry.queries("q73_decontamination")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val g8 = SparkEntry.queries("q118_span_decontamination")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val triage = SparkEntry.queries("q119_contamination_triage")(spark, dir)
      .select("source", "n_3gram", "n_8gram")
      .as[(String, Long, Long)].collect()
    triage.map(_._2).sum shouldBe g3.size.toLong
    triage.map(_._3).sum shouldBe g8.size.toLong
    triage.foreach { case (s, n3, n8) =>
      n3 shouldBe g3.count(srcOf(_) == s).toLong
      n8 shouldBe g8.count(srcOf(_) == s).toLong
    }
    // The cheap 3-gram gate structurally dominates the 8-word gate.
    g8.subsetOf(g3) shouldBe true
  }
}
