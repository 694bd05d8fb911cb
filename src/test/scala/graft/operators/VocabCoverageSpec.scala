package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-coverage fixture for the q131 tokenizer vocabulary audit: a
  * feed writing only high-frequency tokens covers fully (zero OOV
  * mass), a gibberish feed of unique singletons covers only the slice
  * of its types that squeaks into the frozen top-K by tie-break — the
  * occurrence-weighted OOV mass and the distinct OOV type count both
  * land on exactly computable values.
  */
class VocabCoverageSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a common-token feed covers fully; a gibberish feed's OOV mass " +
      "is exactly its out-of-top-K share") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vocabcov_").toString

    // src_common: 400 distinct tokens, 10 occurrences each (4000 total)
    // — all inside the 512-entry vocab by count.
    val common = (0 until 10).flatMap(_ => (0 until 400).map(i => f"c$i%03d"))
    // src_gibberish: 600 distinct singletons; ties broken by token asc,
    // so exactly the first 112 (g000..g111) join the 400 common tokens
    // in the top-512 vocab; the other 488 types are OOV.
    val gibberish = (0 until 600).map(i => f"g$i%03d")
    val rows = Seq(
      (0L, common.mkString(" "), "en", "src_common", 1L),
      (1L, gibberish.mkString(" "), "en", "src_gibberish", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q131_vocab_coverage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    out("src_common") shouldBe ((4000L, 4000L, 0L, 0L))
    // 600 tokens, 112 in vocab => OOV mass = 488/600, 488 OOV types
    out("src_gibberish") shouldBe
      ((600L, 112L, 488L, math.floor(1000000.0 * 488.0 / 600.0).toLong))
  }

  test("on the fixture corpus coverage is high but not total") {
    val rows = SparkEntry.queries("q131_vocab_coverage")(
        spark, SparkSpec.Sf0001)
      .collect()
    rows should not be empty
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1)             // in-vocab <= total
      r.getLong(4) should (be >= 0L and be <= 1000000L)  // mass in [0,1]
    }
  }
}
