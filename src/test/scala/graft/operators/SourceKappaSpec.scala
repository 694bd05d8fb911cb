package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q186: Cohen's kappa per source. Three planted feeds pin the three
  * regimes the statistic exists to separate — a clean two-class source
  * reads κ = 1 exactly, a fully label-flipped source reads κ = −1
  * exactly (the negative numerator is the floor-division parity case),
  * and a single-class source whose raw agreement is perfect reads
  * κ = 0 by the degenerate-marginals convention (p_e = 1: no skill
  * beyond chance is demonstrable — the "easy source vs healthy source"
  * distinction q173's raw recovery cannot make). */
class SourceKappaSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int): Array[Float] =
    (0 until Dim).map(d => if (d / 6 == cluster) 1.0f else 0.02f).toArray

  test("clean source κ=1, flipped source κ=−1, single-class source " +
      "κ=0 with perfect raw agreement") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kappa_").toString

    // srcClean dominates both label centroids, so the flip source's
    // 2+2 contamination cannot move an argmax.
    val emb =
      (0 until 16).map(i => (i.toLong, vec(0), 0, "srcClean")) ++
      (16 until 32).map(i => (i.toLong, vec(1), 1, "srcClean")) ++
      (32 until 34).map(i => (i.toLong, vec(0), 1, "srcFlip")) ++
      (34 until 36).map(i => (i.toLong, vec(1), 0, "srcFlip")) ++
      (36 until 40).map(i => (i.toLong, vec(0), 0, "srcOne"))
    emb.map { case (id, v, l, _) => (id, v, l) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    emb.map { case (id, _, _, s) => (id, s"doc $id", "en", s, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q186_source_kappa")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // n, agree, po_u, pe_u, kappa_u
    got("srcClean") shouldBe ((32L, 32L, 1000000L, 500000L, 1000000L))
    got("srcFlip") shouldBe ((4L, 0L, 0L, 500000L, -1000000L))
    got("srcOne") shouldBe ((4L, 4L, 1000000L, 1000000L, 0L))

    // worst-first ordering: below-chance feeds surface at the top
    SparkEntry.queries("q186_source_kappa")(spark, dir)
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("srcFlip", "srcOne", "srcClean")
  }
}
