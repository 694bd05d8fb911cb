package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q173: the per-source label-recovery audit — q169 sliced along
  * provenance. On an aligned fixture every source recovers perfectly
  * (worst label = lowest label id by the tie rule, miss 0); when one
  * label is absorbed (the q169 exact-multiset tie plant) and that
  * label ships ONLY through one source, the audit localizes the miss:
  * the carrying source's worst label names it at miss 10⁶ while the
  * other source stays perfect. A vector without a documents row is
  * outside the audit (the q97 integrity relation, inner join). */
class SourceRecoverySpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int, jitter: Int): Array[Float] =
    (0 until Dim).map { d =>
      val base = if (d / 6 == cluster) 1.0f else 0.02f
      base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
    }.toArray

  private def writeFixture(dir: String,
      emb: Seq[(Long, Array[Float], Int)],
      docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    docs.toDF("doc_id", "source")
      .write.parquet(s"$dir/documents.parquet")
  }

  private def audit(
      dir: String): Map[String, (Long, Long, Long, Long, Int, Long)] =
    SparkEntry.queries("q173_source_recovery")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getLong(6))))
      .toMap

  test("aligned geometry: every source recovers perfectly; the worst " +
      "label falls back to the lowest id at miss 0 (tie rule)") {
    val dir = Files.createTempDirectory("srec_ok_").toString
    // three self-cluster labels; source a carries labels {0,1},
    // source b carries {1,2}
    val emb = (0 until 30).map(i => (i.toLong, vec(i % 3, i), i % 3))
    val docs = emb.map { case (id, _, lbl) =>
      (id, if (lbl == 2 || (lbl == 1 && id % 2 == 0)) "b" else "a")
    }
    writeFixture(dir, emb, docs)
    val got = audit(dir)
    got.keySet shouldBe Set("a", "b")
    val (aN, aC, aRec, aLabels, aWorst, aMiss) = got("a")
    aN shouldBe aC
    aRec shouldBe 1000000L
    aLabels shouldBe 2L
    aWorst shouldBe 0 // ties at miss 0 break to the lower label id
    aMiss shouldBe 0L
    val (bN, bC, bRec, bLabels, bWorst, bMiss) = got("b")
    bN shouldBe bC
    bRec shouldBe 1000000L
    bLabels shouldBe 2L
    bWorst shouldBe 1
    bMiss shouldBe 0L
    aN + bN shouldBe 30L
  }

  test("an absorbed label is localized to the source that ships it: " +
      "that source's worst label names it at miss 1e6, the other " +
      "source stays perfect; docless vectors are outside the audit") {
    val dir = Files.createTempDirectory("srec_abs_").toString
    // the q169 absorption plant: label 2 carries label 1's EXACT vector
    // multiset — equal centroids, every assignment a true tie, all of
    // label 2's mass goes to cell 1. Label 2 ships only through "bad".
    val emb =
      (0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
      (0 until 10).map(i => ((100 + i).toLong, vec(1, i), 1)) ++
      (0 until 10).map(i => ((200 + i).toLong, vec(1, i), 2)) :+
      ((999L, vec(0, 3), 0)) // no documents row → outside the audit
    val docs =
      (0 until 10).map(i => (i.toLong, "good")) ++
      (0 until 10).map(i => ((100 + i).toLong, "good")) ++
      (0 until 10).map(i => ((200 + i).toLong, "bad"))
    writeFixture(dir, emb, docs)
    val got = audit(dir)
    got("good") shouldBe ((20L, 20L, 1000000L, 2L, 0, 0L))
    got("bad") shouldBe ((10L, 0L, 0L, 1L, 2, 1000000L))
  }
}
