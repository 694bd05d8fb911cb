package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Planted-fixture semantics checks for the two round-5 span-level dedup
  * operators:
  *
  *  - q85 (exact-substring span dedup): a verbatim 8+-word passage shared
  *    by two documents must be counted as duplicated windows in BOTH,
  *    an unrelated document contributes zero, and a document shorter
  *    than the window still counts toward `n_docs` with zero windows.
  *  - q88 (asymmetric containment): a short document quoted whole inside
  *    a long one must score containment ≈ 1 while its Jaccard stays low —
  *    the subset case document-level Jaccard (q37) misses by design.
  */
class SpanContainmentSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Words outside the shared passage are all distinct across docs so the
    * only cross-doc window/shingle overlap is the planted one. */
  private def plantDocs(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_span_").toString
    val passage = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 10 words → 3 8-grams
    def filler(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10" // contained doc (10 words)
    val docs = Seq(
      // A and B: same 10-word passage + distinct filler → 3 dup 8-grams each
      (0L, s"$passage ${filler("a", 5)}", "en", "s1"),
      (1L, s"$passage ${filler("b", 5)}", "en", "s1"),
      // C: no shared span
      (2L, filler("c", 15), "en", "s2"),
      // D: shorter than the window — zero windows, still a document
      (3L, "d0 d1 d2", "en", "s2"),
      // E inside F: whole-quote containment, sizes 10 vs 40
      (4L, quote, "en", "s3"),
      (5L, s"${filler("f", 15)} $quote ${filler("g", 15)}", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q85 counts the planted cross-doc span in both docs and nothing else") {
    val dir = plantDocs()
    val out = Dedup.queries("q85_span_dedup")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // s1: A has 15 words → 8 windows, 3 of them (the passage 8-grams)
    // also live in B; same for B. 6/16 duplicated, both docs ≥ 20% → flagged.
    out("s1") shouldBe ((2L, 16L, 6L, 2L))
    // s2: C = 15 words → 8 windows, none shared; D = 3 words → 0 windows
    // but still counted as a doc, never flagged.
    out("s2") shouldBe ((2L, 8L, 0L, 0L))
    // s3: E (10 words → 3 windows) is quoted verbatim inside F, so every
    // E-window is a dup; F (40 words → 33 windows) duplicates those 3.
    out("s3") shouldBe ((2L, 36L, 6L, 1L))
  }

  test("q88 scores the whole-quote pair containment 1.0 with low Jaccard") {
    val dir = plantDocs()
    val rows = Dedup.queries("q88_containment")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(4), r.getLong(5)))).toMap

    // E ⊂ F: all 8 of E's 3-gram shingles appear in F.
    val (containment, jaccard) = rows((4L, 5L))
    containment shouldBe 1000000L
    jaccard should be < 400000L // 8 shared / (8 + 38 - 8) ≈ 0.21

    // A/B share only the passage: containment (8 shared 3-grams over the
    // 13-shingle smaller set) sits well below the quote pair's.
    val (abContainment, _) = rows((0L, 1L))
    abContainment should be < containment
  }
}
