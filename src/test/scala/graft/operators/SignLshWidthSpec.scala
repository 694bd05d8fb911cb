package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Configurable sign-LSH bucket width (round-4 verdict task 5).
  *
  * `Similarity.LshBitsConf` widens the q39/q40 blocking key beyond the
  * 8-bit default — the log(n) scale knob the module scaladoc names. Two
  * properties make widening safe:
  *
  *  1. MONOTONE PRUNING: each extra bit splits every bucket in two, so
  *     the candidate pairs at `bits+k` are a SUBSET of those at `bits` —
  *     widening can only drop candidates, never invent them.
  *  2. NEAR-DUP RECALL: planted near-identical pairs agree on every
  *     leading-dim sign (their per-dim deltas are small relative to
  *     component magnitudes), so they survive any width — equal recall
  *     on the planted pairs at 8 and 12 bits.
  *
  * Fixture: 4 planted clone pairs (near-identical, sign-stable in all
  * dims) + 56 seeded-random background vectors. Backgrounds collide at
  * 8 bits often enough that 12 bits strictly prunes (asserted), while
  * every planted pair survives both widths.
  */
class SignLshWidthSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def plant(): String = {
    val dir = Files.createTempDirectory("graft_lshbits_")
    dir.toFile.deleteOnExit()
    val rnd = new scala.util.Random(42)
    // 4 clone pairs: base vector with |components| >= 0.2, clone adds
    // noise <= 0.05 — signs identical in every dim at any width.
    val clones = (0 until 4).flatMap { c =>
      val base = Array.fill(Dim)((rnd.nextDouble() * 0.8 + 0.2).toFloat *
        (if (rnd.nextBoolean()) 1f else -1f))
      val close = base.map(v => v + (rnd.nextDouble() * 0.1 - 0.05).toFloat *
        math.signum(v))
      Seq(base, close)
    }
    // Background: random signs — many share leading-8 sign patterns but
    // diverge in dims 9-12, so 12-bit bucketing prunes their pairings.
    val bg = (0 until 56).map { _ =>
      Array.fill(Dim)((rnd.nextDouble() * 2.0 - 1.0).toFloat)
    }
    val rows = (clones ++ bg).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq, i % 10)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  private def pairsAt(dir: String, bits: Option[Int],
      threshold: Double): Set[(Long, Long)] = {
    bits match {
      case Some(b) => spark.conf.set(Similarity.LshBitsConf, b.toString)
      case None    => spark.conf.unset(Similarity.LshBitsConf)
    }
    try Similarity.embeddingNearDup(spark, dir, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    finally spark.conf.unset(Similarity.LshBitsConf)
  }

  private val plantedPairs =
    (0 until 4).map(c => (2L * c, 2L * c + 1)).toSet

  test("wider bucketing yields a subset of candidates with equal recall " +
      "on the planted near-dup pairs") {
    val dir = plant()
    // threshold -1: every intra-bucket pair survives, exposing raw
    // candidate generation (the property under test is blocking, not
    // the cosine filter).
    val at8 = pairsAt(dir, None, threshold = -1.0)
    val at12 = pairsAt(dir, Some(12), threshold = -1.0)
    withClue(s"12-bit pairs must be a subset of 8-bit pairs: ") {
      at12.subsetOf(at8) shouldBe true
    }
    withClue(s"widening should strictly prune background collisions: ") {
      at12.size should be < at8.size
    }
    // Equal recall on the planted pairs at both widths.
    plantedPairs.subsetOf(at8) shouldBe true
    plantedPairs.subsetOf(at12) shouldBe true
    info(s"candidates: ${at8.size} @8 bits -> ${at12.size} @12 bits; " +
      s"planted recall 4/4 at both")
  }

  test("default width unchanged: no conf == explicit 8 bits") {
    val dir = plant()
    val default = pairsAt(dir, None, threshold = 0.8)
    val explicit8 = pairsAt(dir, Some(8), threshold = 0.8)
    default shouldBe explicit8
    // The production threshold admits exactly the planted clone pairs.
    default shouldBe plantedPairs
  }
}
