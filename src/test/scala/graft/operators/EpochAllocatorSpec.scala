package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Feasibility-flag test for the q103 epoch allocator: a source that is
  * tiny relative to its mixing weight must cross the over-repeat cliff
  * (> 4 epochs), while a source with ample data relative to its weight
  * needs no upsampling at all — and the allocated targets sum to the
  * budget up to per-source floor loss.
  */
class EpochAllocatorSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(n: Int): String = Seq.fill(n)("t").mkString(" ")

  test("a tiny high-weight source over-repeats; an ample source needs " +
      "no upsampling; targets respect the budget") {
    import spark.implicits._
    val dir = Files.createTempDirectory("epoch_").toString

    // Weights derive from md5(source) so pick names with known weights:
    // rely only on RELATIVE sizing — "big" has 100x the tokens of
    // "tiny", and any quarter-step weight pair is within 4x of each
    // other, so at a 2x-corpus budget: tiny's epochs >= ~2x*25 and
    // big's <= ~2x/6 of the worst case — assert via the flags.
    val rows =
      (0 until 50).map(i => (i.toLong, doc(200), "en", "big", 1L)) ++
        Seq((100L, doc(100), "en", "tiny", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q103_epoch_allocator")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getBoolean(6))).toMap

    val (availT, targetT, epochsT, upT, overT) = out("tiny")
    val (availB, targetB, epochsB, upB, overB) = out("big")
    availT shouldBe 100L
    availB shouldBe 10000L
    // budget = 2 * 10100 tokens split by weight; tiny's share is at
    // least budget * 250/(250+1000) / 100 tokens = 40+ epochs
    overT shouldBe true
    upT shouldBe true
    epochsT should be > 4000000L
    // big: even at max weight its target <= 2*10100*1000/1250 = 16160
    // over 10000 available = 1.6 epochs — upsampled maybe, never over
    overB shouldBe false
    epochsB should be < 4000000L
    // floor-division targets never exceed the budget
    (targetT + targetB) should be <= 2L * (availT + availB)
  }
}
