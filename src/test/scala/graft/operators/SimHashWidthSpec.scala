package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Configurable SimHash fingerprint width (round-12 verdict task 1).
  *
  * `Dedup.SimHashBitsConf` widens q36's fingerprint from the
  * oracle-pinned 32 bits (4×8-bit bands — 256 buckets per band, the
  * measured ×68 hazard on the direct 100× sweep) to 64 bits (4×16-bit
  * bands — 65,536 buckets per band, the same radius-3 pigeonhole).
  * Three properties make the wide path shippable:
  *
  *  1. EXACT-DUP RECALL IS WIDTH-INVARIANT: identical texts have
  *     identical shingle sets, hence identical fingerprints at ANY
  *     width — hamming 0, same value in every band, always paired.
  *  2. RADIUS CONTRACT: every emitted pair has hamming ≤ 3 at the
  *     live width (the banding is candidate generation; the hamming
  *     filter is the verify step — blocking can only lose pairs,
  *     never admit a beyond-radius one).
  *  3. FIDELITY FOLLOWS THE WIDTH: q98's estimator re-bases to
  *     cos(π·h/64), and on the wide path every scored pair stays
  *     within the audit tolerance.
  *
  * Fixture: 3 planted exact-dup pairs over distinct 40-word texts
  * drawn from a large synthetic vocabulary (so background docs share
  * no shingles — their fingerprints are uncorrelated and 64-bit
  * hamming ≤ 3 collisions cannot occur) + 20 background docs.
  */
class SimHashWidthSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def text(seed: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until 40).map(_ => s"tok${r.nextInt(1000000)}").mkString(" ")
  }

  private def plant(): String = {
    val dir = Files.createTempDirectory("graft_simhash_")
    dir.toFile.deleteOnExit()
    // doc 2c & 2c+1 (c < 3): exact duplicates; docs 6..25: background.
    val texts =
      (0 until 3).flatMap(c => Seq(text(100 + c), text(100 + c))) ++
        (0 until 20).map(i => text(500 + i))
    val rows = texts.zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t, "en", s"src${i % 4}", t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def pairsAt(dir: String, bits: Option[Int]): Seq[(Long, Long, Int)] = {
    bits match {
      case Some(b) => spark.conf.set(Dedup.SimHashBitsConf, b.toString)
      case None    => spark.conf.unset(Dedup.SimHashBitsConf)
    }
    try graft.SparkEntry.queries("q36_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    finally spark.conf.unset(Dedup.SimHashBitsConf)
  }

  private val plantedPairs = (0 until 3).map(c => (2L * c, 2L * c + 1)).toSet

  test("loud rejection of invalid widths") {
    Seq("48", "twelve", "0", "128").foreach { bad =>
      spark.conf.set(Dedup.SimHashBitsConf, bad)
      try {
        val e = intercept[IllegalArgumentException] {
          Dedup.simhashBits(spark)
        }
        withClue(s"width '$bad': ") {
          e.getMessage should include(Dedup.SimHashBitsConf)
        }
      } finally spark.conf.unset(Dedup.SimHashBitsConf)
    }
  }

  test("default width unchanged: no conf == explicit 32") {
    val dir = plant()
    pairsAt(dir, None).toSet shouldBe pairsAt(dir, Some(32)).toSet
  }

  test("64-bit path: exact-dup recall intact, radius contract holds, " +
      "disjoint-shingle backgrounds never pair") {
    val dir = plant()
    val wide = pairsAt(dir, Some(64))
    val widePairs = wide.map(p => (p._1, p._2)).toSet
    withClue("planted exact dups must survive any width: ") {
      plantedPairs.subsetOf(widePairs) shouldBe true
    }
    wide.filter(p => plantedPairs((p._1, p._2)))
      .foreach(p => withClue(s"exact dup $p: ") { p._3 shouldBe 0 })
    wide.foreach(p => withClue(s"radius contract $p: ") {
      p._3 should be <= 3
    })
    withClue("backgrounds share no shingles — only planted pairs: ") {
      widePairs shouldBe plantedPairs
    }
    info(s"64-bit pairs: ${wide.size} (3 planted exact dups, 0 spurious)")
  }

  test("q98 fidelity audit re-bases its estimator to the live width " +
      "and stays within tolerance on the 64-bit path") {
    val dir = plant()
    spark.conf.set(Dedup.SimHashBitsConf, "64")
    try {
      val row = graft.SparkEntry.queries("q98_simhash_fidelity")(spark, dir)
        .collect().head
      val nPairs = row.getLong(row.fieldIndex("n_pairs"))
      val within = row.getLong(row.fieldIndex("n_within_tol"))
      nPairs should be >= 3L // the planted exact dups at minimum
      withClue("every 64-bit pair within the audit tolerance: ") {
        within shouldBe nPairs
      }
      // exact dups: est cos = cos(0) = 1.0 exactly; exact cos = 1.0
      row.getLong(row.fieldIndex("max_abs_err_u")) should be <=
        Dedup.SimHashCosTolU
    } finally spark.conf.unset(Dedup.SimHashBitsConf)
  }

  test("estimator table follows the width: cos(pi*h/64) not cos(pi*h/32)") {
    Dedup.simHashEstCosU(32) shouldBe Dedup.SimHashEstCosU
    val w = Dedup.simHashEstCosU(64)
    w(0) shouldBe 1000000L
    // h=3 at 64 bits: cos(3pi/64) ~ 0.98918 — strictly tighter than
    // 32's cos(3pi/32) ~ 0.95694
    w(3) should be > Dedup.SimHashEstCosU(3)
    w(3) shouldBe math.floor(1e6 * math.cos(math.Pi * 3 / 64)).toLong
  }
}
