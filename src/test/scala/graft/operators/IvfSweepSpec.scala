package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q166's one-pass prefix-predicate sweep must agree with ACTUALLY
  * serving the index: the hit counts at nprobe = 1 and 2 are pinned
  * against `ivfAnn` runs at those probe budgets intersected with the
  * brute-force truth, and the curve must be monotone in both recall
  * and candidate cost. */
class IvfSweepSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("sweep hit counts equal the served index's recall at nprobe 1 " +
      "and 2; recall and cost monotone in nprobe") {
    val dir = SparkSpec.Sf0001
    val sweep = SparkEntry.queries("q166_nprobe_sweep")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    sweep.keySet shouldBe Set(1L, 2L, 4L, 8L)

    val truth = SparkEntry.queries("q38_cosine_topk")(spark, dir)
      .filter("rank <= 5")
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    Seq(1, 2).foreach { p =>
      val served = Similarity.ivfAnn(spark, dir, k = 5, nprobe = p)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"nprobe=$p: ") {
        sweep(p.toLong)._1 shouldBe (served intersect truth).size.toLong
        sweep(p.toLong)._2 shouldBe truth.size.toLong
      }
    }

    val ps = Seq(1L, 2L, 4L, 8L)
    ps.zip(ps.tail).foreach { case (a, b) =>
      sweep(a)._3 should be <= sweep(b)._3 // recall monotone
      sweep(a)._4 should be <= sweep(b)._4 // cost monotone
    }
    // probing more cells must actually buy recall somewhere on this
    // data, else the sweep table is vacuous
    sweep(8L)._3 should be > sweep(1L)._3
  }
}
