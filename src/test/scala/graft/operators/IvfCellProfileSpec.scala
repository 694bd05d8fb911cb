package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-skew fixture for the q130 IVF cell-profile audit: vectors
  * built on orthogonal label directions assign to their own label's
  * cell with exact counts, a label whose centroid exactly duplicates
  * another's loses ALL its members to the lower cell id (the argmax
  * tie-break) and must still appear as an EMPTY cell — the wasted-
  * capacity signal the audit exists to surface — and the share/load
  * columns carry the exact micro-unit arithmetic.
  */
class IvfCellProfileSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("hot, balanced, and empty cells are all reported with exact loads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ivfprofile_").toString

    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == axis) 1.0f else 0.0f)

    // labels 0/1/2 on orthogonal axes; label 3 DUPLICATES label 0's
    // direction, so its centroid ties and the tie-break empties cell 3.
    val rows =
      (0 until 5).map(i => (i.toLong, unit(0), 0)) ++
      (5 until 10).map(i => (i.toLong, unit(1), 1)) ++
      (10 until 15).map(i => (i.toLong, unit(2), 2)) ++
      (15 until 18).map(i => (i.toLong, unit(0), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q130_ivf_cell_profile")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    out.keySet shouldBe Set(0L, 1L, 2L, 3L)
    // cell 0 absorbs label 3's members (8 of 18 vectors)
    out(0L) shouldBe ((8L, 444444L, 1777777L))
    out(1L) shouldBe ((5L, 277777L, 1111111L))
    out(2L) shouldBe ((5L, 277777L, 1111111L))
    // the emptied codebook cell still appears — zero members, zero load
    out(3L) shouldBe ((0L, 0L, 0L))
  }

  test("on the fixture corpus every cell appears and loads sum to ~K") {
    val rows = SparkEntry.queries("q130_ivf_cell_profile")(
        spark, SparkSpec.Sf0001)
      .collect()
    rows.length shouldBe 10 // the 10-label codebook domain
    val totalShare = rows.map(_.getLong(2)).sum
    totalShare should (be > 990000L and be <= 1000000L) // floors undershoot
  }
}
