package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q209 (holdout head scorecard) + q226 (quantization decision impact)
  * on a planted cleanly-separable corpus: two labels on orthogonal
  * axes with small noise. Both halves of the vec_id-parity split carry
  * both labels, so the holdout accuracy must be exactly 10⁶ per label
  * with strictly positive margins; and because the classes sit far
  * from the boundary, the int8 round-trip must flip NOTHING — the
  * delta and flip columns read exactly 0. */
class HoldoutScorecardSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def plant(): String = {
    val dir = Files.createTempDirectory("graft_holdout_")
    dir.toFile.deleteOnExit()
    val rnd = new scala.util.Random(7)
    // label 0: mass on dims 0..7; label 1: mass on dims 8..15 — signs
    // stable, cosine within-class ~1, across-class ~0.
    def vec(label: Int): Array[Float] = {
      val base = Array.fill(Dim)(0.01f + rnd.nextFloat() * 0.01f)
      val lo = label * 8
      (lo until lo + 8).foreach(i => base(i) = 0.8f + rnd.nextFloat() * 0.1f)
      base
    }
    // label alternates PAIRWISE so both parity halves of the split
    // carry both labels (ids 0,1 -> label 0; 2,3 -> label 1; ...)
    val rows = (0 until 40).map { i =>
      val label = (i % 4) / 2
      Row(i.toLong, vec(label).toSeq, label)
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

  test("q209: perfect holdout recovery on separable labels, margins " +
      "strictly positive on unseen vectors") {
    val dir = plant()
    val card = SparkEntry.queries("q209_head_scorecard")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.toSeq).toMap
    card.keySet shouldBe Set(0, 1)
    card.values.foreach { v =>
      v(1) shouldBe 10L       // n_test: 20 odd ids, 10 per label
      v(2) shouldBe 10L       // n_correct
      v(3) shouldBe 1000000L  // acc_u
      withClue("holdout min margin strictly positive: ") {
        v(4).asInstanceOf[Long] should be > 0L
      }
    }
  }

  test("q226: int8 round-trip flips nothing on separable labels — " +
      "delta and flips exactly 0") {
    val dir = plant()
    val rows = SparkEntry.queries("q226_quant_impact")(spark, dir)
      .collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      withClue(s"label ${r.getInt(0)}: ") {
        r.getLong(r.fieldIndex("n_correct_full")) shouldBe 10L
        r.getLong(r.fieldIndex("n_correct_quant")) shouldBe 10L
        r.getLong(r.fieldIndex("n_flips")) shouldBe 0L
        r.getLong(r.fieldIndex("delta_u")) shouldBe 0L
      }
    }
  }
}
