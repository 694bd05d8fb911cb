package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-drift fixture for the q126 label-distribution PSI: a small
  * feed whose predicted labels collapse onto one class must cross the
  * 0.25 investigate band while the healthy uniform feeds stay under
  * 0.1 — the classifier-output drift alarm fires on the drifted feed
  * and ONLY on it, at a realistic (small) corpus fraction so the
  * mixture itself is not dragged to the drifted side.
  */
class LabelPsiSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a label-collapsed feed crosses 0.25; uniform feeds stay under 0.1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("labelpsi_").toString

    // src0/src1: 90 vectors each, labels uniform over 0..9.
    // src2: 10 vectors, every label 0 — the collapsed feed.
    val healthy = (0 until 180).map { i =>
      (i.toLong, s"src${i % 2}", (i / 2 % 10))
    }
    val drifted = (180 until 190).map(i => (i.toLong, "src2", 0))
    val rows = healthy ++ drifted

    rows.map { case (id, s, _) => (id, s"doc $id", "en", s, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    rows.map { case (id, _, l) =>
      (id, Array.tabulate(64)(j => ((id * 7 + j) % 13 - 6) / 10.0f), l)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val psi = SparkEntry.queries("q126_label_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

    psi.keySet shouldBe Set("src0", "src1", "src2")
    psi("src0") should be < 100000L
    psi("src1") should be < 100000L
    psi("src2") should be > 250000L
  }
}
