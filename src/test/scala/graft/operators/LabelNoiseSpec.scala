package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q175/q178: the confident-learning label-noise family. Pins the
  * three behaviors that make the confident joint trustworthy — a clean
  * geometry produces ZERO contradictions (and, with degenerate
  * per-class multisets, full confident coverage), a planted mislabel
  * is found, named, and ranked exactly, and a vector clearing NO class
  * threshold abstains instead of polluting the joint (Cleanlab's
  * guard: low-confidence rows are not evidence of anything). */
class LabelNoiseSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  /** A unit-ish direction concentrated on cluster `c`'s 6-dim block. */
  private def vec(cluster: Int): Array[Float] =
    (0 until Dim).map { d =>
      if (d / 6 == cluster) 1.0f else 0.02f
    }.toArray

  private def writeEmb(dir: String,
      rows: Seq[(Long, Array[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def audit(dir: String): Map[Int, (Long, Long, Long, Int, Long)] =
    SparkEntry.queries("q175_label_noise")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(5), r.getLong(6)))) // n_vecs, n_confident, n_noise, tc, tcn
      .toMap

  private def roster(dir: String): Array[(Long, Int, Int, Long)] =
    SparkEntry.queries("q178_noise_roster")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(5)))

  test("clean geometry: zero contradictions, full confident coverage " +
      "on identical per-class multisets, empty roster") {
    val dir = Files.createTempDirectory("noise_ok_").toString
    writeEmb(dir, (0 until 30).map(i => (i.toLong, vec(i % 3), i % 3)))
    val got = audit(dir)
    got.keySet shouldBe Set(0, 1, 2)
    for ((_, (nVecs, nConf, nNoise, tc, tcn)) <- got) {
      nVecs shouldBe 10L
      // identical vectors ⇒ self-cos == the class mean exactly ⇒ every
      // vector clears its own threshold (>=) ⇒ full coverage
      nConf shouldBe 10L
      nNoise shouldBe 0L
      tc shouldBe -1
      tcn shouldBe 0L
    }
    roster(dir) shouldBe empty
  }

  test("a planted mislabel is found, named, and ranked: cluster-1 " +
      "vector labeled 0 lands in the joint at (0, 1)") {
    val dir = Files.createTempDirectory("noise_planted_").toString
    val rows =
      (0 until 10).map(i => (i.toLong, vec(0), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(1), 1)) :+
        ((999L, vec(1), 0)) // the mislabeled document
    writeEmb(dir, rows)
    val got = audit(dir)
    got(0) shouldBe ((11L, 11L, 1L, 1, 1L)) // 1 contradicted, toward 1
    got(1)._3 shouldBe 0L
    val r = roster(dir)
    r should have size 1
    val (vecId, given, pred, wrongU) = r.head
    vecId shouldBe 999L
    given shouldBe 0
    pred shouldBe 1
    // the geometry believes class 1 far more than the given class 0
    wrongU should be > 500000L
  }

  test("q181 localizes a poisoned feed: the mislabel's SOURCE carries " +
      "the noise, every other source reads zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("noise_src_").toString
    val rows =
      (0 until 10).map(i => (i.toLong, vec(0), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(1), 1)) :+
        ((999L, vec(1), 0)) // mislabeled, shipped by sBad
    writeEmb(dir, rows)
    rows.map { case (id, _, _) =>
      (id, "x", "en", if (id == 999L) "sBad" else "sGood", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q181_noise_by_source")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getLong(6)))).toMap
    // (n_vecs, n_noise, noise_rate_u, worst_label, worst_label_n)
    got("sBad") shouldBe ((1L, 1L, 1000000L, 0, 1L))
    got("sGood") shouldBe ((20L, 0L, 0L, -1, 0L))
    // and the noisy source ranks first
    SparkEntry.queries("q181_noise_by_source")(spark, dir)
      .collect().head.getString(0) shouldBe "sBad"
  }

  test("a vector clearing no class threshold abstains: counted in " +
      "support, absent from the confident joint") {
    val dir = Files.createTempDirectory("noise_abstain_").toString
    val rows =
      (0 until 10).map(i => (i.toLong, vec(0), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(1), 1)) :+
        ((999L, vec(5), 0)) // off in an unrelated subspace, labeled 0
    writeEmb(dir, rows)
    val got = audit(dir)
    got(0)._1 shouldBe 11L // support counts it...
    got(0)._2 shouldBe 10L // ...the confident set does not
    got(0)._3 shouldBe 0L  // and it is NOT noise evidence
    roster(dir) shouldBe empty
  }
}
