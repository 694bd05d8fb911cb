package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q177's Good–Turing numbers are exact integer arithmetic, so the
  * spec pins them with hand-computed fixtures: a never-repeats source
  * reads unseen-mass 10⁶ exactly, a fully-repetitive source reads 0,
  * and a mixed vocabulary lands on the hand-derived N/V/N₁/N₂ row —
  * token counts aggregated across the source's documents, not within
  * one. */
class GoodTuringSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((src, text), i) =>
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("hand-computed frequency-of-frequencies rows, cross-document") {
    val docs = Seq(
      // sOnce: every token distinct → N=4 V=4 N1=4 N2=0, P0 = 1.
      ("sOnce", "a b"), ("sOnce", "c d"),
      // sRep: one token four times → N=4 V=1 N1=0 N2=0, P0 = 0.
      ("sRep", "x x"), ("sRep", "x x"),
      // sMix: p once, q twice (ACROSS docs), r three times →
      // N=6 V=3 N1=1 N2=1.
      ("sMix", "p q r"), ("sMix", "q r r"))
    val dir = Files.createTempDirectory("gt_").toString
    write(dir, docs)

    val got = SparkEntry.queries("q177_good_turing")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap

    got("sOnce") shouldBe ((4L, 4L, 4L, 0L, 1000000L, 1000000L))
    got("sRep") shouldBe ((4L, 1L, 0L, 0L, 0L, 0L))
    // unseen = ⌊10⁶·1/6⌋, hapax share = ⌊10⁶·1/3⌋
    got("sMix") shouldBe ((6L, 3L, 1L, 1L, 166666L, 333333L))
  }

  test("ordering is novelty-first: the id-like source outranks prose") {
    // sIds never repeats a token (hash-like content); sProse repeats
    // half its vocabulary. The crawl-prioritization read: sIds' next
    // token is certainly novel.
    val docs = Seq(
      ("sIds", "h1 h2 h3 h4 h5 h6 h7 h8"),
      ("sProse", "the cat saw the dog and the cat left"))
    val dir = Files.createTempDirectory("gt2_").toString
    write(dir, docs)
    val rows = SparkEntry.queries("q177_good_turing")(spark, dir).collect()
    rows.head.getString(0) shouldBe "sIds"
    rows.head.getLong(5) shouldBe 1000000L
  }
}
