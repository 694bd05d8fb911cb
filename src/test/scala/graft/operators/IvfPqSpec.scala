package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q137's IVF-PQ path must be the exact composition it claims: coarse
  * cosine assignment → per-cell floor-mean residuals → residual-PQ
  * encode → within-cell ADC — a hand-rolled reference sharing nothing
  * with the engine reproduces every output cell; on a one-cell corpus
  * whose vectors are exact seed copies the residual quantization is
  * lossless, so ADC == exact and recall is 5/5 by construction; and on
  * two well-separated label clusters the candidate counts equal the
  * cell memberships (the IVF partition is real, not decorative).
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim
  private val S = Similarity.PqSubspaces
  private val K = Similarity.PqCodes
  private val SubDim = Dim / S
  private val NQ = 8
  private val TopK = 5

  private def writeEmb(dir: String, vals: Int => Int => Float, n: Int,
      label: Int => Int): Unit = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until Dim).map(j => vals(i)(j)).toArray, label(i))
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Reference pipeline sharing nothing with the engine but the spec:
    * returns q_id -> (cell, n_cand, n_exact, n_hits, exact_sum, adc_sum). */
  private def reference(vals: Int => Int => Float, n: Int, label: Int => Int)
      : Map[Long, (Int, Long, Long, Long, Long, Long)] = {
    def scaled(i: Int): Array[Long] =
      (0 until Dim).map(j => math.floor(vals(i)(j).toDouble * 10000.0).toLong).toArray
    val v = (0 until n).map(scaled)
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val labels = (0 until n).map(label).distinct.sorted
    // Coarse codebook: per-label SUM vectors (q44's centroid recipe).
    val csum = labels.map { l =>
      val m = (0 until n).filter(label(_) == l)
      l -> Array.tabulate(Dim)(j => m.map(i => v(i)(j)).sum)
    }.toMap
    def cosTo(x: Array[Long], c: Array[Long]): Double =
      dot(x, c).toDouble / math.sqrt(dot(x, x).toDouble * dot(c, c).toDouble)
    val cell = (0 until n).map(i =>
      labels.maxBy(l => (cosTo(v(i), csum(l)), -l)))
    // Per-label floor-mean centroid (exact floor division).
    val cmean = labels.map { l =>
      val cn = (0 until n).count(label(_) == l).toLong
      l -> csum(l).map(s => Math.floorDiv(s, cn))
    }.toMap
    val resid = (0 until n).map(i =>
      v(i).zip(cmean(cell(i))).map { case (x, m) => x - m })
    def sub(x: Array[Long], s: Int) = x.slice(s * SubDim, (s + 1) * SubDim)
    val code = Array.tabulate(n, S) { (i, s) =>
      (0 until K).minBy(c => (d2(sub(resid(i), s), sub(resid(c), s)), c))
    }
    (0 until NQ).map { q =>
      val cand = (NQ until n).filter(cell(_) == cell(q))
      val adc = cand.map { i =>
        i.toLong -> (0 until S).map(s =>
          d2(sub(resid(q), s), sub(resid(code(i)(s)), s))).sum
      }
      val adcTop = adc.sortBy { case (id, d) => (d, id) }.take(TopK)
      val exact = (NQ until n).map(i => i.toLong -> d2(v(q), v(i)))
      val exTop = exact.sortBy { case (id, d) => (d, id) }.take(TopK)
      val hits = exTop.map(_._1).toSet.intersect(adcTop.map(_._1).toSet).size
      q.toLong -> (cell(q), cand.size.toLong, TopK.toLong, hits.toLong,
        exTop.map(_._2).sum, adcTop.map(_._2).sum)
    }.toMap
  }

  private def run(dir: String): Map[Long, (Int, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SparkEntry.queries("q137_ivfpq_adc")(spark, dir)
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
      .map { case (q, c, nc, ne, nh, ed, ad) => q -> (c, nc, ne, nh, ed, ad) }
      .toMap
  }

  test("engine output equals the reference IVF-PQ pipeline cell-for-cell " +
      "on a general multi-cell corpus") {
    val dir = Files.createTempDirectory("ivfpq_").toString
    val vals = (i: Int) => (j: Int) => (((i * 31 + j * 7) % 23) - 11) / 10.0f
    writeEmb(dir, vals, 40, i => i % 3)
    run(dir) shouldBe reference(vals, 40, i => i % 3)
  }

  test("one-cell corpus of exact seed copies: residual quantization is " +
      "lossless, ADC == exact, recall 5/5") {
    val dir = Files.createTempDirectory("ivfpq0_").toString
    // Vector i copies seed i % K; one label ⇒ one cell ⇒ one shared
    // floor-mean ⇒ residuals are seed-residual copies ⇒ zero
    // reconstruction error for every vector.
    val vals = (i: Int) => (j: Int) => ((((i % 16) * 37 + j * 11) % 29) - 14) / 10.0f
    writeEmb(dir, vals, 48, _ => 0)
    val got = run(dir)
    got.keySet shouldBe (0L until NQ.toLong).toSet
    got.foreach { case (_, (cell, nCand, ne, nh, ed, ad)) =>
      cell shouldBe 0
      nCand shouldBe (48 - NQ).toLong
      ne shouldBe TopK.toLong
      nh shouldBe TopK.toLong
      ad shouldBe ed
    }
  }

  test("two separated clusters: candidate counts equal cell memberships " +
      "and queries stay in their own cluster's cell") {
    val dir = Files.createTempDirectory("ivfpq2_").toString
    // Cluster A (label 0): mass on the first half of the dims;
    // cluster B (label 1): mass on the second half — orthogonal, so
    // cosine assignment can never cross.
    val vals = (i: Int) => (j: Int) =>
      if (i % 2 == 0) { if (j < Dim / 2) 1.0f + (j % 5) / 10.0f else 0.01f }
      else { if (j >= Dim / 2) 1.0f + (j % 7) / 10.0f else 0.01f }
    writeEmb(dir, vals, 40, i => i % 2)
    val got = run(dir)
    got.foreach { case (q, (cell, nCand, _, _, _, _)) =>
      cell shouldBe (q % 2).toInt
      // corpus rows 8..39: 16 even (cell 0), 16 odd (cell 1)
      nCand shouldBe 16L
    }
  }
}
