package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q158's sweep is pinned two ways: on a planted corpus the SSE is
  * hand-exact and IDENTICAL at every M (one perturbed component —
  * finer subspaces localize it but cannot change the squared error),
  * and on real embeddings the distortion must be monotone
  * non-increasing in M (finer quantization can only fit better). */
class PqSweepSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  test("planted corpus: hand-exact SSE, identical across M; bits and " +
      "per-vector arithmetic exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pqsweep_").toString
    // 16 constant seed vectors (codebook), values in exact 0.125 steps;
    // two byte-identical copies of seeds (zero error) and ONE vector
    // perturbed by +0.25 in component 0 → scaled diff 2500, so total
    // SSE = 2500² = 6_250_000 at EVERY M.
    def const(v: Double) = Seq.fill(Dim)(v.toFloat)
    val rows =
      (0 until 16).map(i => (i.toLong, const((i + 1) * 0.125), i % 10)) ++
        Seq((100L, const(0.25), 1), (101L, const(0.875), 6),
          (102L, (0.75f +: const(0.5).tail).toSeq, 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q158_pq_budget_sweep")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got.keySet shouldBe Set(2L, 4L, 8L, 16L)
    got.foreach { case (m, (bits, n, sse, perVec)) =>
      bits shouldBe 4L * m
      n shouldBe 19L
      sse shouldBe 6250000L
      perVec shouldBe 6250000L / 19L
    }
  }

  test("real embeddings: distortion is monotone non-increasing in M") {
    val rows = SparkEntry.queries("q158_pq_budget_sweep")(
      spark, SparkSpec.Sf0001).collect()
    val byM = rows.map(r => r.getLong(0) -> r.getLong(3)).sortBy(_._1)
    byM.map(_._1) shouldBe Array(2L, 4L, 8L, 16L)
    byM.sliding(2).foreach { case Array((_, a), (_, b)) =>
      b should be <= a
    }
    byM.head._2 should be > 0L // the sweep is non-degenerate
  }
}
