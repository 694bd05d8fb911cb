package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q187: the selective-prediction risk–coverage table. A planted
  * corpus with (a) high-confidence correct vectors, (b) one
  * high-confidence MISLABELED vector (confidence cannot save you from
  * label noise — it stays in the kept set at every threshold), and
  * (c) one genuinely ambiguous vector that only a low threshold
  * admits, must read: fixed 5-row table, coverage monotone as the
  * threshold loosens, the ambiguous vector excluded above 0.80, and
  * exact floor-div micro rates throughout. */
class RiskCoverageSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  // base exactly 0: a shared off-block component would lift the
  // ambiguous vector's top cosine past the 0.80 gate (0.801 with 0.02)
  private def vec(cluster: Int): Array[Float] =
    (0 until Dim).map(d => if (d / 6 == cluster) 1.0f else 0.0f).toArray

  /** Both blocks hot: ≈ 0.79 top cosine — confident under 0.50,
    * never under 0.80. */
  private def mid(): Array[Float] =
    (0 until Dim).map(d => if (d < 12) 1.0f else 0.0f).toArray

  test("planted confident/mislabeled/ambiguous corpus: exact 5-row " +
      "operating table, coverage monotone, ambiguity gated out high") {
    import spark.implicits._
    val dir = Files.createTempDirectory("riskcov_").toString
    val emb =
      (0 until 8).map(i => (i.toLong, vec(0), 0)) ++   // confident, correct
      (8 until 16).map(i => (i.toLong, vec(1), 1)) ++  // confident, correct
      Seq((16L, vec(1), 0)) ++                          // confident, WRONG
      Seq((17L, mid(), 1))                              // ambiguous
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    emb.map { case (id, _, _) => (id, s"doc $id", "en", "src0", 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q187_risk_coverage")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

    rows.map(_._1).toSeq shouldBe
      Seq(990000L, 950000L, 900000L, 800000L, 500000L)
    // coverage (and kept counts) are monotone as the threshold loosens
    rows.map(_._2).toSeq shouldBe rows.map(_._2).sorted.toSeq
    // the ambiguous vector (≈0.79 top cosine) enters ONLY at 0.50
    val byThr = rows.map(r => r._1 -> r).toMap
    byThr(800000L)._2 shouldBe 17L
    byThr(500000L)._2 shouldBe 18L
    byThr(500000L)._3 shouldBe 1000000L // full coverage at 0.50
    // the mislabeled-but-confident vector caps selective accuracy at
    // every threshold: 16/17 kept-correct in the confident regime
    byThr(990000L)._2 shouldBe 17L
    byThr(990000L)._4 shouldBe 16L
    byThr(990000L)._5 shouldBe (1000000L * 16L) / 17L
    // exact floor-div invariants hold on every row
    rows.foreach { case (_, kept, cov, correct, acc) =>
      cov shouldBe (1000000L * kept) / 18L
      acc shouldBe (if (kept == 0L) 0L else (1000000L * correct) / kept)
    }
  }
}
