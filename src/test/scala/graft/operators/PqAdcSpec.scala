package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q136's ADC serving path must be the exact table-lookup sum it
  * claims: against a hand-rolled reference (encode → LUT → ADC top-5 →
  * recall vs exact L2 top-5) every output cell matches; and on a
  * corpus that IS codebook-representable (every vector a seed copy)
  * ADC distances coincide with exact distances, so recall is perfect
  * by construction. */
class PqAdcSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim
  private val S = Similarity.PqSubspaces
  private val K = Similarity.PqCodes
  private val SubDim = Dim / S
  private val NQ = 8
  private val TopK = 5

  private def writeEmb(dir: String, vals: Int => Int => Float, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until Dim).map(j => vals(i)(j)).toArray, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Reference pipeline sharing nothing with the engine but the spec. */
  private def reference(vals: Int => Int => Float, n: Int)
      : Map[Long, (Long, Long, Long, Long)] = {
    def scaled(i: Int): Array[Long] =
      (0 until Dim).map(j => math.floor(vals(i)(j).toDouble * 10000.0).toLong).toArray
    val v = (0 until n).map(scaled)
    def sub(x: Array[Long], s: Int) = x.slice(s * SubDim, (s + 1) * SubDim)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // encode
    val code = Array.tabulate(n, S) { (i, s) =>
      (0 until K).minBy(c => (d2(sub(v(i), s), sub(v(c), s)), c))
    }
    (0 until NQ).map { q =>
      val adc = (NQ until n).map { i =>
        i.toLong -> (0 until S).map(s => d2(sub(v(q), s), sub(v(code(i)(s)), s))).sum
      }
      val adcTop = adc.sortBy { case (id, d) => (d, id) }.take(TopK)
      val exact = (NQ until n).map(i => i.toLong -> d2(v(q), v(i)))
      val exTop = exact.sortBy { case (id, d) => (d, id) }.take(TopK)
      val hits = exTop.map(_._1).toSet.intersect(adcTop.map(_._1).toSet).size
      q.toLong -> (TopK.toLong, hits.toLong, exTop.map(_._2).sum, adcTop.map(_._2).sum)
    }.toMap
  }

  private def run(dir: String): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    SparkEntry.queries("q136_pq_adc_recall")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (q, ne, nh, ed, ad) => q -> (ne, nh, ed, ad) }.toMap
  }

  test("engine output equals the reference ADC pipeline cell-for-cell " +
      "on a general corpus") {
    val dir = Files.createTempDirectory("adc_").toString
    val vals = (i: Int) => (j: Int) => (((i * 31 + j * 7) % 23) - 11) / 10.0f
    writeEmb(dir, vals, 40)
    run(dir) shouldBe reference(vals, 40)
  }

  test("on a codebook-representable corpus (every vector a seed copy) " +
      "ADC equals exact: 5/5 recall and equal distance masses per query") {
    val dir = Files.createTempDirectory("adc0_").toString
    // Vector i is an exact copy of seed i % K ⇒ reconstruction is
    // lossless, so ADC distance == exact distance for every pair.
    val vals = (i: Int) => (j: Int) => ((((i % 16) * 37 + j * 11) % 29) - 14) / 10.0f
    writeEmb(dir, vals, 48)
    val got = run(dir)
    got.keySet shouldBe (0L until NQ.toLong).toSet
    got.foreach { case (_, (ne, nh, ed, ad)) =>
      ne shouldBe TopK.toLong
      nh shouldBe TopK.toLong
      ad shouldBe ed
    }
  }
}
