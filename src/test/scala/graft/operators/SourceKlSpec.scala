package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-distribution test for the q101 per-source KL monitor: two
  * sources drawing from the same vocabulary score near zero; a third
  * source using a disjoint vocabulary (the "feed changed domain under
  * us" case) must dominate the triage list — while every one of its
  * documents individually looks fine for its source.
  */
class SourceKlSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a source with a disjoint vocabulary dominates KL; same-mixture " +
      "sources stay near zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kl_").toString

    // srcA/srcB: identical unigram mixture; srcC: disjoint vocabulary.
    val shared = Seq("alpha", "beta", "gamma", "delta")
    val rows = (0 until 60).map { i =>
      val src = s"src${i % 3}"
      val words =
        if (i % 3 == 2) (0 until 20).map(j => s"zz${(i + j) % 4}")
        else (0 until 20).map(j => shared((i + j) % 4))
      (i.toLong, words.mkString(" "), "en", src, 10L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val kl = SparkEntry.queries("q101_source_kl")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    kl.keySet shouldBe Set("src0", "src1", "src2")
    // Disjoint feed: KL = ln(3) exactly (its tokens appear nowhere
    // else, so c·M/(N·m) = M/N = 3) ≈ 1.0986 nats in micro-units.
    kl("src2") should be > 1000000L
    // Same-mixture feeds: ln(3/2)-ish (their mass excludes src2's
    // third), far below the divergent feed.
    kl("src0") should be < 500000L
    kl("src1") should be < 500000L
    kl("src2") should be > 2L * math.max(kl("src0"), kl("src1"))
  }
}
