package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q196: Two-NN intrinsic dimensionality per label. Planted geometry
  * with hand-computable exact distance ratios: a 3-point line gives
  * known ln μ micro terms (ln 9, ln 4, ln 2.25); an exact-duplicate
  * pair is excluded from the estimator but counted (n_dup0); a vector
  * alone in its sign bucket reads n_sparse, never a silent drop. */
class TwoNnSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("line, duplicate-pair, and lone-bucket labels read exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("twonn_").toString
    def vec(base: Float, at: Int = -1, x: Float = 0f,
        at2: Int = -1, x2: Float = 0f): Array[Float] = {
      val v = Array.fill(64)(0.0f)
      (0 until 8).foreach(v(_) = base)
      if (at >= 0) v(at) = x
      if (at2 >= 0) v(at2) = x2
      v
    }
    val emb = Seq(
      // label 0: a line along component 8 at spacing 0.1/0.3 — squared
      // distances 1e6/4e6/9e6 in scaled units
      (0L, vec(0.5f), 0),
      (1L, vec(0.5f, 8, 0.1f), 0),
      (2L, vec(0.5f, 8, 0.3f), 0),
      // label 1: an exact-duplicate pair plus an equidistant third
      (3L, vec(0.5f, 9, 1.0f), 1),
      (4L, vec(0.5f, 9, 1.0f), 1),
      (5L, vec(0.5f, 9, 1.0f, 10, 0.2f), 1),
      // label 2: alone in the negative-sign bucket
      (6L, vec(-0.5f), 2))
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q196_twonn_id")(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    // ln terms in micro-nats: ln 9 → 2197224, ln 4 → 1386294,
    // ln 2.25 → 810930; id = 2e12·n_used // Σ
    val expectedId = 6000000000000L / (2197224L + 1386294L + 810930L)
    got(0) shouldBe ((3L, 3L, 0L, 0L, expectedId))
    // duplicate pair: excluded from the estimator (d₁=0), counted; the
    // equidistant third has ln μ = 0, so the sum degenerates to id 0
    got(1) shouldBe ((3L, 1L, 0L, 2L, 0L))
    // lone bucket: sparse, not dropped
    got(2) shouldBe ((1L, 0L, 1L, 0L, 0L))
  }
}
