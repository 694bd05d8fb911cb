package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q190: Simpson token concentration per source. Hand-planted exact
  * rationals: an all-distinct source reads exactly 0, a 3-of-4-repeat
  * source reads exactly 1/2, a cross-document repeat reads exactly 1/6
  * (the index is corpus-level per source, not per document), and the
  * ordering is concentration-first. */
class SimpsonSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("exact rational concentrations and concentration-first order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("simpson_").toString
    val docs = Seq(
      (0L, "a b c d", "srcFlat"),
      (1L, "a a a b", "srcDup"),
      (2L, "x y", "srcTwo"),
      (3L, "x z", "srcTwo"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q190_simpson")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

    got("srcFlat") shouldBe ((4L, 4L, 0L))       // Σc(c−1)=0
    got("srcDup") shouldBe ((4L, 2L, 500000L))   // 6/12 = 1/2
    got("srcTwo") shouldBe ((4L, 3L, 166666L))   // 2/12 floor-µ
    SparkEntry.queries("q190_simpson")(spark, dir)
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("srcDup", "srcTwo", "srcFlat")
  }
}
