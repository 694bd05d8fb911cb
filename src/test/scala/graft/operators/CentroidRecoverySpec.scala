package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q169: the centroid label-recovery audit. On a geometry-aligned
  * fixture every label recovers perfectly; when one label carries the
  * EXACT vector multiset of another (identical centroids, so every
  * assignment is a true cosine tie), the argmax tie rule sends all of
  * its mass to the lower cell — recovery 0, dominant cell named — and
  * the absorbing label still recovers its own vectors. */
class CentroidRecoverySpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int, jitter: Int): Array[Float] =
    (0 until Dim).map { d =>
      val base = if (d / 6 == cluster) 1.0f else 0.02f
      base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
    }.toArray

  private def writeEmb(dir: String,
      rows: Seq[(Long, Array[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def audit(dir: String): Map[Int, (Long, Long, Long, Int, Long)] =
    SparkEntry.queries("q169_centroid_recovery")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5))))
      .toMap

  test("aligned geometry recovers every label perfectly") {
    val dir = Files.createTempDirectory("crec_ok_").toString
    writeEmb(dir, (0 until 30).map { i =>
      (i.toLong, vec(i % 3, i), i % 3)
    })
    val got = audit(dir)
    got.keySet shouldBe Set(0, 1, 2)
    for ((label, (nVecs, nCorrect, recU, topCell, topN)) <- got) {
      nVecs shouldBe 10L
      nCorrect shouldBe 10L
      recU shouldBe 1000000L
      topCell shouldBe label
      topN shouldBe 10L
    }
  }

  test("the label codebook is hard-pinned: spark.graft.ivf.codebook=" +
      "trained changes NOTHING in the recovery audit (trained cells are " +
      "cluster ids, not labels)") {
    val dir = Files.createTempDirectory("crec_conf_").toString
    writeEmb(dir, (0 until 30).map(i => (i.toLong, vec(i % 3, i), i % 3)))
    val before = audit(dir)
    spark.conf.set(Similarity.IvfCodebookConf, "trained")
    try audit(dir) shouldBe before
    finally {
      spark.conf.unset(Similarity.IvfCodebookConf)
      Features.clear(spark)
    }
  }

  test("a label carrying another's exact vector multiset is absorbed " +
      "whole: recovery 0, dominant cell = the lower label (tie rule)") {
    val dir = Files.createTempDirectory("crec_dup_").toString
    // label 0: its own cluster; labels 1 and 2: IDENTICAL multisets on
    // cluster 1 — centroids exactly equal, every assignment a true tie.
    val rows =
      (0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
      (0 until 10).map(i => ((100 + i).toLong, vec(1, i), 1)) ++
      (0 until 10).map(i => ((200 + i).toLong, vec(1, i), 2))
    writeEmb(dir, rows)
    val got = audit(dir)
    got(0) shouldBe ((10L, 10L, 1000000L, 0, 10L))
    got(1) shouldBe ((10L, 10L, 1000000L, 1, 10L)) // absorbs the tie
    got(2) shouldBe ((10L, 0L, 0L, 1, 10L))        // fully absorbed
  }
}
