package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-distribution fixtures for the two reference-free
  * distribution audits.
  *
  * q125 (Zipf slope): a feed whose token frequencies follow c/r must
  * fit near slope −10⁶ (micro-units), while a feed with a uniform head
  * — the machine-generated signature — fits exactly 0 (zero covariance
  * between ln rank and a constant ln freq).
  *
  * q128 (unigram entropy): a one-token template feed carries exactly
  * zero entropy; an all-distinct feed carries exactly ln(vocab) with
  * normalized entropy exactly 1.0 — both pinned as exact micro-nat
  * integers, no tolerance.
  */
class ZipfEntropySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(id: Long, src: String, toks: Seq[String]) = {
    val text = toks.mkString(" ")
    (id, text, "en", src, text.length.toLong)
  }

  test("q125: a c/r feed fits near slope -1e6; a uniform head fits 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zipf_").toString

    // src_zipf: token z_r appears ⌊96/r⌋ times, r = 1..8.
    val zipfToks = (1 to 8).flatMap(r => Seq.fill(96 / r)(s"z$r"))
    // src_flat: 8 tokens, 12 occurrences each — a uniform head.
    val flatToks = (1 to 8).flatMap(r => Seq.fill(12)(s"f$r"))
    Seq(doc(0L, "src_zipf", zipfToks), doc(1L, "src_flat", flatToks))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q125_zipf_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    out("src_zipf")._2 shouldBe 96L            // rank-1 count
    out("src_zipf")._3 should be < -900000L    // near-Zipfian slope
    out("src_zipf")._3 should be > -1100000L
    out("src_flat")._3 shouldBe 0L             // zero covariance exactly
  }

  test("q128: template feed = zero entropy; all-distinct feed = ln(vocab), " +
      "normalized exactly 1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("entropy_").toString

    val template = Seq.fill(100)("spam")
    val diverse = (0 until 16).map(i => s"word$i")
    Seq(doc(0L, "src_template", template), doc(1L, "src_diverse", diverse))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q128_source_entropy")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // one token ⇒ H = ln N − (N·ln N)/N = 0 exactly; vocab 1 ⇒ norm 0
    out("src_template") shouldBe ((100L, 1L, 0L, 0L))
    // 16 distinct singletons ⇒ H = ln 16 (c·ln c terms all zero);
    // ⌊10⁶·ln 16⌋ = 2772588, and H / ln V = 1 exactly in micro-units
    out("src_diverse") shouldBe ((16L, 16L, 2772588L, 1000000L))
  }
}
