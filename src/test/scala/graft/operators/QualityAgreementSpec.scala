package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q112's quality method-agreement audit:
  * clean diverse docs must land in the (high, admitted) cell, phrase
  * loops in the (medium, rejected) disagreement cell — the heuristic's
  * structural blind spot the composite gate catches via repetition —
  * and tiny docs in (low, rejected). The cells the fixture plants
  * must be the ONLY populated cells.
  */
class QualityAgreementSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("phrase loops surface as rules-medium/gate-rejected; clean and " +
      "tiny docs agree; no other cells populated") {
    import spark.implicits._
    val dir = Files.createTempDirectory("qagree_").toString

    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango")
    // clean: 30 tokens, all distinct within the doc (uniq 1.0, no
    // repeated trigram), shared ACROSS docs so each token is
    // in-distribution for its language (ln(600/20) ≈ 3.4 < the 3.5
    // LM cut) → rules 'high', gate admits
    val cleanTokens =
      (0 until 30).map(j => vocab(j % 20) + "s" + (j / 20)).mkString(" ")
    val clean = (0 until 20).map { i => (i.toLong, cleanTokens) }
    // loops: one trigram repeated — rules see n_tokens ≥ 15 ('medium',
    // uniq ratio far below the 'high' cut) but CANNOT see the
    // repetition; the gate rejects on duplicate-3-gram fraction
    val loops = (20 until 30).map { i =>
      (i.toLong,
        Seq.fill(13)(s"spin${i % 3} loop${i % 3} again${i % 3}")
          .mkString(" "))
    }
    // tiny: under the 5-token length floor → rules 'low', gate 'length'
    val tiny = (30 until 35).map { i => (i.toLong, "hi there") }
    // each group is its own language so one group's vocabulary cannot
    // drag another's LM surprisal over the gate threshold
    def lang(id: Long): String =
      if (id < 20) "en" else if (id < 30) "xx" else "yy"
    (clean ++ loops ++ tiny).map { case (id, t) =>
      (id, t, lang(id), s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q112_quality_agreement")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
    // collapse the surprisal split: assert on the rules × gate margins
    val cells = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    cells(("high", 1L)) shouldBe 20L
    cells(("medium", 0L)) shouldBe 10L
    cells(("low", 0L)) shouldBe 5L
    // the planted cells are the ONLY populated cells: no high-rejected,
    // no medium-admitted, no low-admitted
    cells.keySet shouldBe Set(("high", 1L), ("medium", 0L), ("low", 0L))
    cells.values.sum shouldBe 35L
  }
}
