package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec, Tables}

/** q141's bigram surprisal must catch exactly what q87's unigram model
  * cannot: a shuffled copy of common prose (same unigram multiset ⇒
  * identical unigram cross-entropy) scores strictly worse on bigrams;
  * the arithmetic is pinned by hand on a two-doc corpus; and the
  * Stupid-Backoff serving scorer reproduces q141 in-corpus (zero
  * backoff) while firing the α = 0.4 unigram backoff — with the OOV
  * floor — on out-of-corpus adjacencies, at hand-computed values. */
class BigramLmSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("a shuffled copy of common prose is invisible to unigram xent " +
      "but worst-ranked by bigram xent") {
    val dir = Files.createTempDirectory("bg_").toString
    val natural = "alpha bravo charlie delta echo foxtrot golf hotel"
    // Same 8 words, adjacencies deranged.
    val salad = "bravo delta alpha foxtrot charlie hotel echo golf"
    writeDocs(dir, (0L until 10L).map(i => (i, natural)) :+ (10L, salad))

    // Unigram xent (q87): every doc has the same token multiset over
    // the same corpus counts ⇒ all 11 docs score identically.
    val uni = SparkEntry.queries("q87_lm_quality")(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    uni.size shouldBe 11
    uni.values.toSet.size shouldBe 1

    // Bigram xent (q141): the salad doc is strictly worst.
    val bi = SparkEntry.queries("q141_bigram_lm")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    bi.head._1 shouldBe 10L
    val saladX = bi.head._2
    bi.tail.foreach { case (_, x) => saladX should be > x }
  }

  test("two-doc corpus: xent2_u matches hand arithmetic exactly") {
    val dir = Files.createTempDirectory("bg2_").toString
    // doc 0: "a b a b" → bigrams ab, ba, ab;  doc 1: "a b c" → ab, bc
    writeDocs(dir, Seq((0L, "a b a b"), (1L, "a b c")))
    // corpus: c(ab)=3, c(ba)=1, c(bc)=1; ctx(a)=3, ctx(b)=2
    def u(tf: Long, ctx: Long, cnt: Long): Long =
      math.floor(1e6 * tf * math.log(ctx.toDouble / cnt)).toLong
    val d0 = math.floor((u(2, 3, 3) + u(1, 2, 1)).toDouble / 3).toLong
    val d1 = math.floor((u(1, 3, 3) + u(1, 2, 1)).toDouble / 2).toLong
    val got = SparkEntry.queries("q141_bigram_lm")(spark, dir)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    got(0L) shouldBe ((3L, d0))
    got(1L) shouldBe ((2L, d1))
  }

  test("serving scorer == q141 in-corpus with zero backoff; unseen " +
      "adjacency and OOV word hit the hand-computed backoff branch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bg3_").toString
    writeDocs(dir, Seq((0L, "a b a b"), (1L, "a b c")))
    val (bc, ctx, uni, tot) = TextAnalysis.bigramLmTables(spark, dir)

    val inCorpus = TextAnalysis.bigramScoreOver(
      Tables.documents(spark, dir), bc, ctx, uni, tot)
      .collect().map(r =>
        r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val q141 = SparkEntry.queries("q141_bigram_lm")(spark, dir)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    inCorpus.foreach { case (id, (nb, nback, x)) =>
      nback shouldBe 0L
      (nb, x) shouldBe q141(id)
    }

    // "c a": both words known, adjacency unseen → backoff to c(a)=3 of
    // N=7: ln(2.5·7/3). "a zz": zz is OOV → floor ucnt=1: ln(2.5·7/1).
    val batch = Seq((100L, "c a", "en"), (101L, "a zz", "en"))
      .toDF("doc_id", "text", "lang")
    val served = TextAnalysis.bigramScoreOver(batch, bc, ctx, uni, tot)
      .collect().map(r =>
        r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def back(ucnt: Long): Long =
      math.floor(1e6 * math.log(2.5 * 7 / ucnt.toDouble)).toLong
    served(100L) shouldBe ((1L, 1L, back(3)))
    served(101L) shouldBe ((1L, 1L, back(1)))
  }
}
