package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Similarity

/** `--diversify` / [[Similarity.mmrRerank]]: the greedy MMR pass must
  * (a) reduce to pure relevance at λ=100, (b) on a planted
  * near-duplicate candidate list at λ=50, pull the second TOPIC above
  * the first topic's duplicate — the exact property the flag exists
  * for, pinned order-exactly, and (c) ship through the Serve CLI with
  * the same rows the retriever served, loudly rejecting a bad λ. */
class MmrServeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  /** blockA: dims 0–5; blockB: dims 6–11; the query leans A with a
    * small B component, so A-docs are more relevant than B-docs. */
  private def vecOf(a: Float, b: Float, base: Float = 0.01f): Array[Float] =
    (0 until Dim).map { d =>
      if (d < 6) a else if (d < 12) b else base
    }.toArray

  private def writeEmb(dir: String,
      rows: Seq[(Long, Array[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def plantedDir(): String = {
    val dir = Files.createTempDirectory("mmr_").toString
    writeEmb(dir, Seq(
      (0L, vecOf(1.0f, 0.3f), 0),   // the query
      (10L, vecOf(1.0f, 0.0f), 0),  // topic A
      (11L, vecOf(1.0f, 0.0f), 0),  // topic A near-duplicate
      (12L, vecOf(0.0f, 1.0f), 1))) // topic B — less relevant, novel
    dir
  }

  private def served(qid: Long, ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(id => (qid, id)).toDF("q_id", "vec_id")
  }

  test("λ=100 is pure relevance: ranked by cosine desc, ties to the " +
      "lower id") {
    val dir = plantedDir()
    val got = Similarity.mmrRerank(spark, dir, served(0L, Seq(12L, 11L, 10L)),
      100).collect().map(r => (r.getLong(1), r.getLong(2)))
    got shouldBe Array((10L, 1L), (11L, 2L), (12L, 3L))
  }

  test("λ=50 surfaces the second topic above the first topic's " +
      "near-duplicate") {
    val dir = plantedDir()
    val got = Similarity.mmrRerank(spark, dir, served(0L, Seq(10L, 11L, 12L)),
      50).collect().map(r => r.getLong(1))
    got shouldBe Array(10L, 12L, 11L)
  }

  test("λ=0 is pure anti-redundancy: after the top pick, the novel " +
      "topic wins regardless of relevance") {
    val dir = plantedDir()
    val got = Similarity.mmrRerank(spark, dir, served(0L, Seq(10L, 11L, 12L)),
      0).collect().map(r => r.getLong(1))
    // first pick is still the relevance argmax (empty selected set ⇒
    // the sim term is 0 for everyone)
    got.head shouldBe 10L
    got(1) shouldBe 12L
  }

  test("anti-similarity is kept, not clamped: a candidate anti-similar " +
      "to the selected set outranks an equally-relevant orthogonal one") {
    import spark.implicits._
    def unit(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(Dim)(0.0f)
      pairs.foreach { case (i, v) => a(i) = v }
      a
    }
    val dir = Files.createTempDirectory("mmr_neg_").toString
    writeEmb(dir, Seq(
      (0L, unit(0 -> 1.0f), 0),             // the query: pure e0
      (10L, unit(0 -> 1.0f, 1 -> 0.3f), 0), // top relevance, picked 1st
      (11L, unit(2 -> 1.0f), 0),            // rel 0, orthogonal to 10
      (12L, unit(1 -> -1.0f), 1)))          // rel 0, ANTI-similar to 10
    // λ·rel − (1−λ)·max sim: for 12 the max sim is NEGATIVE (−0.287),
    // so its score exceeds λ·rel; a max(0, sim) clamp would tie 11/12
    // at 0 and pick the lower id. The documented formula picks 12.
    val got = Similarity.mmrRerank(spark, dir, served(0L, Seq(10L, 11L, 12L)),
      50).collect().map(r => r.getLong(1))
    got shouldBe Array(10L, 12L, 11L)
  }

  test("vector-less candidates ship AFTER the re-ranked head in id " +
      "order with null scores — same rows, never a silent shrink") {
    // the fused retriever's BM25 leg serves text-only docs on any
    // corpus with partial embedding coverage — the production norm
    val dir = plantedDir()
    val got = Similarity.mmrRerank(spark, dir,
      served(0L, Seq(10L, 99L, 12L, 98L)), 50).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.isNullAt(3)))
    got.map(_._1).toSeq shouldBe Seq(10L, 12L, 98L, 99L)
    got.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L, 4L) // contiguous ranks
    got.map(_._3).toSeq shouldBe Seq(false, false, true, true)
  }

  test("a served QUERY with no embeddings row fails LOUDLY — there is " +
      "no relevance instrument without the query vector") {
    val dir = plantedDir()
    val e = intercept[Exception] {
      Similarity.mmrRerank(spark, dir, served(77L, Seq(10L, 11L)), 50)
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    msgs should include("no embeddings row")
  }

  test("the fused retriever's doc_id column resolves too: " +
      "--diversify over q144 keeps its candidate sets") {
    val sfDir = SparkSpec.Sf0001
    val out = Files.createTempDirectory("serve_mmr_f_").toString + "/job"
    Serve.run(Array(sfDir, out, "--diversify", "100"),
      Some(spark)) shouldBe 0 // default retriever = fused (doc_id column)
    val got = spark.read.json(s"$out/results")
      .select("q_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = SparkEntry.queries("q144_rrf_fusion")(spark, sfDir)
      .select("q_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe expected
    expected should not be empty
  }

  test("Serve --diversify ships the same candidates per query, " +
      "re-ranked 1..k; a bad λ is a usage error") {
    val sfDir = SparkSpec.Sf0001
    val base = Files.createTempDirectory("serve_mmr_")
    val out = base.toString + "/job"
    Serve.run(Array(sfDir, out, "--retriever", "dense",
      "--diversify", "50"), Some(spark)) shouldBe 0
    val got = spark.read.json(s"$out/results")
      .select("q_id", "doc_id", "mmr_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = SparkEntry.queries("q38_cosine_topk")(spark, sfDir)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // same candidate SET per query, contiguous ranks starting at 1
    got.map(t => (t._1, t._2)).toSet shouldBe expected.toSet
    got.groupBy(_._1).values.foreach { rs =>
      rs.map(_._3).sorted shouldBe (1L to rs.length).toArray
    }

    Serve.run(Array(sfDir, base.toString + "/bad",
      "--diversify", "101"), Some(spark)) shouldBe 1
    Serve.run(Array(sfDir, base.toString + "/bad2",
      "--diversify", "fifty"), Some(spark)) shouldBe 1
  }
}
