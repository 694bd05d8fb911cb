package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q107 DSIR importance weighting: the target
  * source writes in vocabulary A, the crawl sources in vocabulary B. A
  * single crawl document written in vocabulary A (the hidden gem DSIR
  * exists to find) must be selected; pure vocabulary-B crawl docs must
  * be rejected; and a crawl doc with content identical to a target doc
  * must score the identical weight (content determinism).
  */
class DsirWeightsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a crawl doc in the target's vocabulary is selected, " +
      "off-target crawl docs are rejected, equal content scores equal") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dsir_").toString

    val vocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val vocabB = Vector("red", "blue", "green", "yellow", "purple",
      "orange", "brown", "black")
    def sentence(vocab: Vector[String], seed: Int): String =
      (0 until 20).map(j => vocab((seed * 7 + j * 3) % vocab.size))
        .mkString(" ")

    val targetDocs = (0 until 10).map { i =>
      (i.toLong, sentence(vocabA, i), "en", "src0", 100L)
    }
    val crawlDocs = (10 until 40).map { i =>
      (i.toLong, sentence(vocabB, i), "en", s"src${1 + i % 3}", 100L)
    }
    // the hidden gem: crawl-sourced but written in the target vocabulary,
    // content-identical to target doc 0
    val gem = Seq((40L, sentence(vocabA, 0), "en", "src9", 100L))
    (targetDocs ++ crawlDocs ++ gem)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q107_dsir_weights")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3), r.getString(5)))).toMap
    out.size shouldBe 41

    // every target doc is selected (it IS the target distribution)
    (0L until 10L).foreach { id => out(id)._3 shouldBe "selected" }
    // every pure vocabulary-B crawl doc is rejected
    (10L until 40L).foreach { id => out(id)._3 shouldBe "rejected" }
    // the hidden gem is selected despite its crawl source...
    out(40L)._3 shouldBe "selected"
    // ...and scores EXACTLY the weight of its content twin: the score
    // is a function of content alone, not of the source label
    out(40L)._2 shouldBe out(0L)._2
  }
}
