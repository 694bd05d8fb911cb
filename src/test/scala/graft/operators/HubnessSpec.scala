package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q193: kNN in-degree (hubness) bands over the served ANN graph.
  * Planted star geometry: a center vector C plus 8 satellites P₁…P₈ at
  * orthogonal offsets — every satellite's top-5 leads with C, the
  * equal-cosine satellite ties resolve by vec_id, so the exact
  * in-degrees are C=8, P₁…P₄=8, P₅=5, P₆…P₈=0 and the band histogram
  * is fully determined. */
class HubnessSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("star geometry: exact in-degree bands with vec_id tie-breaks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hubness_").toString
    def vec(extra: Int): Array[Float] = {
      val v = Array.fill(64)(0.0f)
      (0 until 8).foreach(v(_) = 0.5f) // same sign bucket for all
      if (extra >= 0) v(extra) = 0.5f
      v
    }
    val emb = (0L, vec(-1), 0) +: (1 to 8).map(i => (i.toLong, vec(7 + i), 0))
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q193_hubness")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    // (n_vecs, sum_occ, share_u): C + P1..P4 at occ 8; P5 at occ 5
    // (cited by C's id-tie top-5 and P1..P4 only); P6..P8 never cited.
    got(0L) shouldBe ((3L, 0L, 333333L))
    got(4L) shouldBe ((1L, 5L, 111111L))
    got(8L) shouldBe ((5L, 40L, 555555L))
    got.keySet shouldBe Set(0L, 4L, 8L)
  }
}
