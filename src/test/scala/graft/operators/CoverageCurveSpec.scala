package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q163's coverage curve, pinned against an independent driver-side
  * replay on a corpus planted with 100 distinct terms at strictly
  * decreasing frequencies (term i appears 101−i times, so the rank
  * order is forced): k = 64 must cover exactly the planted top-64 mass,
  * the larger heads must cover everything, and the curve must be
  * monotone non-decreasing in k. */
class CoverageCurveSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("top-k coverage exact vs an independent frequency replay; " +
      "curve monotone") {
    import spark.implicits._
    // term i (1-based) appears 101 - i times; one doc per term
    val freqs = (1 to 100).map(i => (f"t$i%03d", 101L - i))
    val docs = freqs.zipWithIndex.map { case ((term, cnt), idx) =>
      val text = Seq.fill(cnt.toInt)(term).mkString(" ")
      (idx.toLong, text, "en", "sA", text.length.toLong)
    }
    val dir = Files.createTempDirectory("cov_").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q163_coverage_curve")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    val total = freqs.map(_._2).sum
    def covered(k: Int): Long =
      freqs.sortBy { case (t, c) => (-c, t) }.take(k).map(_._2).sum

    got(64L) shouldBe ((covered(64), total, 100L,
      1000000L * covered(64) / total))
    // heads larger than the vocabulary cover everything
    Seq(256L, 1024L, 4096L).foreach { k =>
      got(k) shouldBe ((total, total, 100L, 1000000L))
    }
    val curve = Seq(64L, 256L, 1024L, 4096L).map(k => got(k)._4)
    curve.zip(curve.tail).foreach { case (a, b) => a should be <= b }
  }
}
