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
}
