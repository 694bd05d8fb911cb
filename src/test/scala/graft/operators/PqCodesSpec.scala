package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q135's PQ encode must be the exact argmin it claims: against a
  * hand-rolled reference encoder over a planted 40×64 corpus, every
  * (subspace, code) cell — population and int64 SSE — matches, every
  * codebook seed reconstructs itself at distance zero, and each
  * subspace's cells partition the corpus. */
class PqCodesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val N = 40
  private val Dim = Similarity.Dim
  private val S = Similarity.PqSubspaces
  private val K = Similarity.PqCodes
  private val SubDim = Dim / S

  // Deterministic distinct-ish floats in [-1.1, 1.1]; vectors repeat
  // with period 23 in vec_id (i=0 and i=23 coincide) — deliberate: the
  // duplicate must land on the seed's own code at distance 0 via the
  // lowest-code tie-break, same as the reference below.
  private def value(i: Int, j: Int): Float =
    (((i * 31 + j * 7) % 23) - 11) / 10.0f

  private def plantEmbeddings(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("pq_").toString
    (0 until N).map { i =>
      (i.toLong, (0 until Dim).map(j => value(i, j)).toArray, i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Reference encoder: same fixed-point scale, same d², same
    * (d², code) tie-break. */
  private def reference(): Map[(Long, Long), (Long, Long)] = {
    def scaled(i: Int): Array[Long] =
      (0 until Dim).map(j => math.floor(value(i, j).toDouble * 10000.0).toLong).toArray
    val vecs = (0 until N).map(scaled)
    def sub(v: Array[Long], s: Int): Array[Long] =
      v.slice(s * SubDim, (s + 1) * SubDim)
    val cells = for (i <- 0 until N; s <- 0 until S) yield {
      val mine = sub(vecs(i), s)
      val (code, d2) = (0 until K).map { c =>
        val cs = sub(vecs(c), s)
        (c.toLong, mine.zip(cs).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.minBy { case (c, d) => (d, c) }
      ((s.toLong, code), d2)
    }
    cells.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2).sum)
    }
  }

  test("engine cells equal the reference encoder exactly (population " +
      "and int64 SSE per (subspace, code))") {
    import spark.implicits._
    val dir = plantEmbeddings()
    val got = SparkEntry.queries("q135_pq_codes")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (s, c, n, sse) => (s, c) -> (n, sse) }.toMap
    got shouldBe reference()
  }

  test("each subspace's cells partition the corpus, and every seed " +
      "vector reconstructs at distance zero on its own code") {
    import spark.implicits._
    val dir = plantEmbeddings()
    val rows = SparkEntry.queries("q135_pq_codes")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, cells) =>
      cells.map(_._3).sum shouldBe N.toLong
    }
    // Seeds at distance zero: every (s, code) cell's SSE equals the
    // reference, and the reference assigns each seed d² = 0 — so each
    // subspace's total SSE excludes any seed contribution. Directly:
    // the duplicate pair (0, 23) plus 16 seeds ⇒ in every subspace at
    // least 17 of the 40 assignments cost zero, so total SSE is bounded
    // by the 23 non-seed rows' worst case and each code-0 cell holds
    // both vec 0 and vec 23.
    val ref = reference()
    rows.foreach { case (s, c, n, sse) => ref((s, c)) shouldBe ((n, sse)) }
    rows.filter(r => r._1 == 0L && r._2 == 0L).map(_._3).sum should be >= 2L
  }
}
