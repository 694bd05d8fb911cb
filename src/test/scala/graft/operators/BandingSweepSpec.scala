package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q142's sweep must respect the banding lattice: a (b × r) hit implies
  * a hit in every finer split (each r-row band contains matching
  * r/2-row sub-bands), so per J band recall is monotone non-decreasing
  * from 1×16 up to 16×1 — exact copies are caught by EVERY
  * configuration, the theory column carries the per-configuration
  * JVM S-curve literals, and the 4×4 rows agree exactly with q129's
  * single-configuration audit. */
class BandingSweepSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def theoryU(bands: Int, rows: Int, jb: Long): Long = {
    val mid = 0.25 * jb + 0.125
    math.floor(1000000.0 *
      (1.0 - math.pow(1.0 - math.pow(mid, rows), bands))).toLong
  }

  test("planted copies: every configuration catches J=1; recall is " +
      "monotone in bands; theory literals are per-config S-curves") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sweep_").toString
    val w = (1 to 20).map(i => s"w$i")
    val dupText = w.mkString(" ")
    val partial = (w.take(12) ++ (1 to 8).map(i => s"u$i")).mkString(" ")
    Seq(
      (0L, dupText, "en", "s0", dupText.length.toLong),
      (1L, dupText, "en", "s0", dupText.length.toLong),
      (2L, partial, "en", "s0", partial.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q142_banding_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(6)))).toMap

    val configs = Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
    configs.foreach { case (b, r) =>
      // J=1 band: the exact-copy pair caught under every split.
      val (nr, np, nc, th) = out((b.toLong, 3L))
      nr shouldBe r.toLong
      np shouldBe 1L
      nc shouldBe 1L
      th shouldBe theoryU(b, r, 3L)
      out((b.toLong, 1L))._4 shouldBe theoryU(b, r, 1L)
    }
    // Monotone: catching under a coarse split implies catching under
    // every finer one ⇒ n_caught non-decreasing as bands grow.
    Seq(1L, 3L).foreach { jb =>
      val caught = configs.map { case (b, _) => out((b.toLong, jb))._2 }
      caught.reverse shouldBe caught.reverse.sorted // ascending in bands
    }
  }

  test("the 4x4 rows of the sweep equal q129's audit on the fixture " +
      "corpus") {
    val sweep = SparkEntry.queries("q142_banding_sweep")(
        spark, SparkSpec.Sf0001)
      .collect().filter(_.getLong(0) == 4L)
      .map(r => r.getLong(2) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val audit = SparkEntry.queries("q129_banding_recall")(
        spark, SparkSpec.Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    sweep shouldBe audit
  }
}
