package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q113's audit must move with the knob it exists to tune: at the
  * default 8-bit sign-LSH width the sf0.001 corpus (500 vectors) has
  * ~2 candidates per bucket and near-zero recall — the "buckets too
  * fine for the corpus" diagnosis — and widening to 2 bits must grow
  * every query's candidate pool and strictly improve total recall.
  */
class AnnRecallSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("recall audit detects too-fine buckets; widening lshBits " +
      "grows candidates and recall") {
    val dir = SparkSpec.Sf0001
    def run(): Map[Long, (Long, Long)] =
      SparkEntry.queries("q113_ann_recall")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap

    spark.conf.unset(Similarity.LshBitsConf)
    val fine = run()
    fine.keySet shouldBe (0L until 8L).toSet
    // the diagnosis: buckets far too fine for 500 vectors
    fine.values.map(_._1).max should be < 10L

    try {
      spark.conf.set(Similarity.LshBitsConf, "2")
      val wide = run()
      // every query's candidate pool grew (coarser buckets are strict
      // supersets of finer ones)
      (0L until 8L).foreach { q =>
        wide(q)._1 should be > fine(q)._1
      }
      // and total recall strictly improved
      val fineHits = fine.values.map(_._2).sum
      val wideHits = wide.values.map(_._2).sum
      wideHits should be > fineHits
    } finally spark.conf.unset(Similarity.LshBitsConf)
  }
}
