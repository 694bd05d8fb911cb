package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.functions.TextFns.{LshBands, LshRows}

/** Planted-Jaccard fixture for the q129 banding-recall audit: an exact
  * copy (J = 1) must land in the top band and ALWAYS be caught
  * (identical shingle sets ⇒ identical signatures ⇒ every band
  * agrees), a ~0.39-Jaccard pair must land in band 1 where the S-curve
  * says capture is rare, and the theory column must carry exactly the
  * JVM-computed 1−(1−J^r)^b midpoint literals.
  */
class BandingRecallSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def theoryU(jb: Long): Long = {
    val mid = 0.25 * jb + 0.125
    math.floor(1000000.0 *
      (1.0 - math.pow(1.0 - math.pow(mid, LshRows), LshBands))).toLong
  }

  test("exact copies are always caught; a low-J pair lands in band 1; " +
      "theory literals match the S-curve") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bandrecall_").toString

    val w = (1 to 20).map(i => s"w$i")
    val dupText = w.mkString(" ")                       // J = 1 with its copy
    // shares the first 12 words with dupText: 10 common shingles,
    // 18 per side => J = 10/26 ~ 0.385 -> band 1
    val partial = (w.take(12) ++ (1 to 8).map(i => s"u$i")).mkString(" ")
    val rows = Seq(
      (0L, dupText, "en", "s0", dupText.length.toLong),
      (1L, dupText, "en", "s0", dupText.length.toLong),
      (2L, partial, "en", "s0", partial.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q129_banding_recall")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    // the exact-copy pair: top band, always caught
    out(3L)._1 shouldBe 1L
    out(3L)._2 shouldBe 1L
    out(3L)._3 shouldBe 1000000L
    // the 0.385-J pairs: doc 2 pairs with BOTH identical copies, so
    // band 1 audits two pairs; identical copies carry identical
    // signatures, so the two are caught together or not at all (the
    // S-curve says ~8% — the audit's job is to COUNT them, not to
    // luck into them)
    out(1L)._1 shouldBe 2L
    Set(0L, 2L) should contain(out(1L)._2)
    // theory literals are the exact midpoint S-curve values
    out(3L)._4 shouldBe theoryU(3L)
    out(1L)._4 shouldBe theoryU(1L)
  }

  test("on the fixture corpus recall is well-formed per band") {
    val rows = SparkEntry.queries("q129_banding_recall")(
        spark, SparkSpec.Sf0001)
      .collect()
    rows should not be empty
    rows.foreach { r =>
      r.getLong(2) should be <= r.getLong(1)           // caught <= pairs
      r.getLong(3) should (be >= 0L and be <= 1000000L) // recall in [0,1]
      r.getLong(4) should (be > 0L and be <= 1000000L)  // theory in (0,1]
    }
  }
}
