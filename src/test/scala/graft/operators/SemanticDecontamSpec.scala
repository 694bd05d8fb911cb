package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-leak test for q105 semantic decontamination: a training
  * vector that is a near-copy of an eval vector (the embedding of a
  * PARAPHRASED benchmark passage — sharing zero n-grams by
  * construction) must be flagged with the right eval id, while an
  * in-bucket but orthogonal training vector passes clean (the
  * threshold, not just the LSH blocking, does the gating).
  */
class SemanticDecontamSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("an eval-twin embedding is flagged against its eval source; an " +
      "in-bucket orthogonal vector passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("semcon_").toString

    // All vectors keep their first 8 components positive so every row
    // lands in the same sign-LSH bucket — the cosine threshold alone
    // decides. id % 17 == 0 is the eval slice: 0 and 17 are eval.
    def base(axis: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == axis) 1.0f else 0.01f)
    val rows = Seq(
      (0L, base(10), 0),  // eval
      (17L, base(20), 1), // eval
      // leak of eval 0: jittered copy, cosine ≈ 1, zero shared text
      (1L, Array.tabulate(64)(j =>
        base(10)(j) + (if (j % 7 == 0) 0.02f else 0.005f)), 0),
      // leak of eval 17: mild noise copy
      (18L, Array.tabulate(64)(j =>
        base(20)(j) + (if (j % 5 == 0) 0.03f else 0.0f)), 1),
      // clean: same bucket (first 8 positive) but orthogonal axis and
      // negative tail ⇒ cosine far below the threshold
      (2L, Array.tabulate(64)(j =>
        if (j < 8) 0.005f else if (j == 30) 1.0f else -0.01f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q105_semantic_decontam")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap

    out.keySet should contain(1L)
    out.keySet should contain(18L)
    out.keySet should not contain 2L
    val (_, cos1, src1) = out(1L)
    src1 shouldBe 0L
    cos1 should be > 900000L // near-copy ⇒ cosine ≈ 1
    val (_, cos18, src18) = out(18L)
    src18 shouldBe 17L
    cos18 should be > 900000L
  }
}
