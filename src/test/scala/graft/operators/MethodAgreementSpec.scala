package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q108's method-agreement audit: a corpus
  * with three exact copies, one word-shuffled copy, and one one-word
  * edit of the same document must produce the three diagnostic rows
  * the audit exists to surface — full agreement on exact copies,
  * content-only hits on the shuffle (order-sensitive sketches
  * structurally miss it), and sketch-only hits on the near-edit
  * (content fingerprint structurally misses it).
  */
class MethodAgreementSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("exact copies agree everywhere, a shuffled copy is content-only, " +
      "a one-word edit is sketch-only") {
    import spark.implicits._
    val dir = Files.createTempDirectory("agree_").toString

    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray", "yankee", "zulu")
    // base doc: 100 tokens, every vocab word present, 'zulu' exactly once
    val baseTokens = (0 until 99).map(j => vocab(j % 25)) :+ "zulu"
    val base = baseTokens.mkString(" ")
    // word-shuffled copy: same token bag, different order
    val shuffled = (baseTokens.grouped(7).toVector.reverse.flatten)
      .mkString(" ")
    // one-word edit: the unique 'zulu' becomes a fresh word
    val edited = (baseTokens.init :+ "golfball").mkString(" ")
    require(baseTokens.count(_ == "zulu") == 1)

    val plants = Seq(
      (0L, base), (1L, base), (2L, base), (3L, shuffled), (4L, edited))
    // filler: unique docs, each from its own token slice — no pairs
    val filler = (5 until 45).map { i =>
      (i.toLong, (0 until 30)
        .map(j => vocab((i * 5 + j * 2) % 25) + i.toString).mkString(" "))
    }
    (plants ++ filler).map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q108_method_agreement")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        r.getLong(4)).toMap

    // 3 pairs among the exact copies: every method agrees
    out((1L, 1L, 1L, 1L)) shouldBe 3L
    // 3 pairs shuffle×copies: content fingerprint catches, ALL
    // order-sensitive sketches miss — the audit's headline diagnosis
    out((1L, 0L, 0L, 0L)) shouldBe 3L
    // 3 pairs edit×copies: MinHash and exact Jaccard catch the
    // near-identical shingle sets, the content fingerprint (different
    // token bag) structurally misses, and SimHash's 32-bit fingerprint
    // over this small shingle set lands at hamming > 3 — each method
    // family fails on ITS OWN structural blind spot, which is the
    // audit's reason to exist
    out((0L, 1L, 0L, 1L)) shouldBe 3L
    // nothing else was flagged by anyone (filler stayed quiet, and the
    // shuffle×edit pairs share no shingle order either)
    out.values.sum shouldBe 9L
  }

  test("viral-dup group cap bounds the content-equality leg at " +
      "cap²/2 per group, never m²/2") {
    import spark.implicits._
    // a planted 10³-copy viral group (the empty-doc/error-page shape
    // that is routine at crawl scale), one small group, some uniques
    val viral = (0 until 1000).map(i => (i.toLong, "VIRAL"))
    val smallG = (1000 until 1003).map(i => (i.toLong, "SMALL"))
    val uniques = (1003 until 1013).map(i => (i.toLong, s"U$i"))
    val fp = (viral ++ smallG ++ uniques).toDF("doc_id", "fp")

    // capped: the viral group emits ZERO pairs; only the small group's
    // 3 pairs survive — bounded by cap²/2 · n_groups, not m²/2
    val cap = 16
    val capped = Dedup.contentEqPairs(fp, cap).collect()
    capped.length shouldBe 3
    assert(capped.length <= cap * cap / 2 * 1)
    // the excluded group is surfaced, not silently lost
    val excl = Dedup.cappedGroups(fp, cap).collect()
    excl.length shouldBe 1
    excl.head.getLong(1) shouldBe 1000L
    // a cap above every group is the identity (the oracle-parity mode:
    // the default 256 clears sf0.1's largest fixture group of 248)
    Dedup.contentEqPairs(fp, 1000).count() shouldBe (999L * 1000L / 2 + 3)
  }

  test("the group cap threads through q108 via " +
      "spark.graft.audit.contentGroupCap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("agreecap_").toString
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray", "yankee")
    val baseTokens = (0 until 99).map(j => vocab(j % 25)) :+ "zulu"
    val base = baseTokens.mkString(" ")
    val plants = Seq((0L, base), (1L, base), (2L, base))
    val filler = (3 until 40).map { i =>
      (i.toLong, (0 until 30)
        .map(j => vocab((i * 5 + j * 2) % 25) + i.toString).mkString(" "))
    }
    (plants ++ filler).map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    def confusion() = SparkEntry.queries("q108_method_agreement")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        r.getLong(4)).toMap

    // default cap (256) clears the 3-copy group: full agreement rows
    confusion()((1L, 1L, 1L, 1L)) shouldBe 3L
    // cap 2 excludes the 3-copy group from the content leg; the pairs
    // remain in the universe via the sketch legs, content flag now 0
    spark.conf.set("spark.graft.audit.contentGroupCap", "2")
    try {
      val capped = confusion()
      capped.get((1L, 1L, 1L, 1L)) shouldBe None
      capped((0L, 1L, 1L, 1L)) shouldBe 3L
    } finally spark.conf.unset("spark.graft.audit.contentGroupCap")
  }
}
