package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q188: the source×label lift table. A hand-planted 2×2 corpus with
  * mirrored 3:1 label skews must read the exact micro-nat lifts —
  * ln(1.5) where a source over-represents a label, ln(0.5) where it
  * starves one (the negative-floor parity case) — and the per-cell MI
  * contributions must sum to the corpus' exact mutual information. */
class LabelLiftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  test("mirrored 3:1 skews read ±exact lifts; contributions sum to " +
      "the corpus MI") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lift_").toString
    val v = Array.fill(Dim)(0.1f)
    val emb =
      (0 until 3).map(i => (i.toLong, v, 0, "srcA")) ++
      Seq((3L, v, 1, "srcA")) ++
      Seq((4L, v, 0, "srcB")) ++
      (5 until 8).map(i => (i.toLong, v, 1, "srcB"))
    emb.map { case (id, vv, l, _) => (id, vv, l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    emb.map { case (id, _, _, s) => (id, s"doc $id", "en", s, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q188_label_lift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    def u(x: Double): Long = math.floor(1000000.0 * math.log(x)).toLong
    def cu(n: Long, x: Double): Long =
      math.floor(1000000.0 * n * math.log(x)).toLong
    // n = 8, marginals all 4: lift(cell) = ln(n_ij·8/16)
    got(("srcA", 0L)) shouldBe ((3L, u(1.5), cu(3, 1.5)))
    got(("srcA", 1L)) shouldBe ((1L, u(0.5), cu(1, 0.5)))
    got(("srcB", 0L)) shouldBe ((1L, u(0.5), cu(1, 0.5)))
    got(("srcB", 1L)) shouldBe ((3L, u(1.5), cu(3, 1.5)))
    // the negative floor: ln(0.5) micro-floors to −693148, not −693147
    u(0.5) shouldBe -693148L
    // contributions sum to the corpus MI (positive: the skew is real)
    got.values.map(_._3).sum should be > 0L
  }
}
