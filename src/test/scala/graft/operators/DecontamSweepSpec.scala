package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q162's threshold sweep, pinned on a corpus planted so each training
  * doc matches an exactly-known number of eval 3-grams (a run of m
  * consecutive eval words inside disjoint filler contributes exactly
  * m − 2 matches): the flagged-doc curve must read (4, 3, 2, 1) at
  * t = (1, 2, 4, 8), char masses and rates exact, and an untouched doc
  * must never be flagged at any threshold. */
class DecontamSweepSpec extends AnyFunSuite with SparkSpec with Matchers {

  // doc_id 0 is the eval slice (0 % 17 == 0): 10 words → 8 shingles.
  private val eval = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"
  private val docs = Seq(
    (0L, eval),                                   // eval slice
    (1L, "f1 f2 e1 e2 e3 f3 f4"),                 // 1 matched shingle
    (2L, "g1 e1 e2 e3 e4 g2"),                    // 2
    (3L, "h1 e1 e2 e3 e4 e5 e6 h2"),              // 4
    (4L, eval),                                   // verbatim: all 8
    (5L, "k1 k2 k3 k4 k5"))                       // clean

  test("flagged docs/chars/rates exact at every threshold; curve " +
      "monotone non-increasing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dsweep_").toString
    docs.map { case (id, text) => (id, text, "en", "sA", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q162_decontam_sweep")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    val chars = docs.toMap.view.mapValues(_.length.toLong).toMap
    def mass(ids: Long*): Long = ids.map(chars).sum
    val train = 5L

    got(1L) shouldBe ((4L, mass(1L, 2L, 3L, 4L), train, 4000000L / 5))
    got(2L) shouldBe ((3L, mass(2L, 3L, 4L), train, 3000000L / 5))
    got(4L) shouldBe ((2L, mass(3L, 4L), train, 2000000L / 5))
    got(8L) shouldBe ((1L, mass(4L), train, 1000000L / 5))

    val curve = Seq(1L, 2L, 4L, 8L).map(t => got(t)._1)
    curve.zip(curve.tail).foreach { case (a, b) => a should be >= b }
  }
}
