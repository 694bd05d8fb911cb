package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-cosine fixture for q124 hard-negative mining: candidates are
  * constructed at known cosines to the query direction, and the band
  * must keep exactly the mid-range ones — the probable positive (0.95)
  * and the orthogonal/far mass (0.05, −0.5) are both excluded, and the
  * in-band survivors rank by cosine descending.
  */
class HardNegativeSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Unit vector at angle cos=a to e0 in the (e0, e_axis) plane. */
  private def vecAt(a: Double, axis: Int): Array[Float] = {
    val b = math.sqrt(math.max(0.0, 1.0 - a * a))
    Array.tabulate(64)(j =>
      if (j == 0) a.toFloat else if (j == axis) b.toFloat else 0.0f)
  }

  test("the band keeps mid-range candidates only, ranked by cosine") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hardneg_").toString

    // 8 query vectors (vec_id < 8), all along +e0.
    val queries = (0L until 8L).map(i => (i, vecAt(1.0, 1), 0))
    // candidates at planted cosines; distinct second axes keep them
    // mutually non-collinear so only the e0 component sets the cosine.
    val cands = Seq(
      (8L, vecAt(0.95, 2), 1),  // probable positive — above the band
      (9L, vecAt(0.25, 3), 1),  // in band
      (10L, vecAt(0.15, 4), 1), // in band
      (11L, vecAt(0.29, 5), 1), // in band (just under the ceiling)
      (12L, vecAt(0.05, 6), 1), // below the band — teaches nothing
      (13L, vecAt(-0.5, 7), 1)) // anti-aligned — far mass
    (queries ++ cands).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q124_hard_negatives")(spark, dir)
      .select("q_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect()

    // every query sees the same three in-band candidates, best first
    (0L until 8L).foreach { q =>
      val mine = out.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      mine shouldBe Seq(11L, 9L, 10L)
    }
  }

  test("on the fixture corpus every mined cosine is inside the band") {
    import spark.implicits._
    val out = SparkEntry.queries("q124_hard_negatives")(
        spark, SparkSpec.Sf0001)
      .select("cos").as[Double].collect()
    out should not be empty
    all(out) should (be >= Similarity.HardNegLo and be < Similarity.HardNegHi)
  }
}
