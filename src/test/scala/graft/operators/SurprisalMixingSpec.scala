package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q109 surprisal-quintile mixing: half the
  * corpus is written from a small shared vocabulary (low surprisal),
  * half is unique gibberish (high surprisal). The gibberish must fill
  * the top buckets, bucket xent ranges must be disjoint and ordered,
  * and the graded admission rates must fall monotonically from the
  * in-distribution quintile to the junk quintile.
  */
class SurprisalMixingSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("junk fills the top quintiles, ranges are ordered, admission " +
      "rates fall monotonically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("surq_").toString

    val common = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "and", "runs")
    val clean = (0 until 50).map { i =>
      (i.toLong, (0 until 40).map(j => common((i + j) % 10)).mkString(" "))
    }
    // gibberish: every token unique in the corpus → max surprisal
    val junk = (50 until 100).map { i =>
      (i.toLong, (0 until 40).map(j => s"zx${i}q$j").mkString(" "))
    }
    (clean ++ junk).map { case (id, t) =>
      (id, t, "en", s"src${id % 4}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q109_surprisal_mixing")(spark, dir)
      .collect().sortBy(_.getLong(0))
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    // ntile(5) over 100 docs: 20 per bucket, all docs covered
    out.map(_.getLong(1)).toSeq shouldBe Seq.fill(5)(20L)
    // bucket xent ranges are ordered and non-overlapping
    out.sliding(2).foreach { case Array(lo, hi) =>
      lo.getLong(5) should be <= hi.getLong(4)
    }
    // the clean half is strictly below the junk half: buckets 1-2 are
    // all-clean territory, buckets 4-5 all-junk, so the xent gap between
    // bucket 2's max and bucket 4's min is the planted separation
    out(1).getLong(5) should be < out(3).getLong(4)
    // graded admission: realized rates fall monotonically with the
    // bucket (90/70/50/30/10 targets over 20-doc buckets)
    val admitted = out.map(_.getLong(2))
    admitted.sliding(2).foreach { case Array(a, b) => a should be >= b }
    admitted.head should be > admitted.last
    // every admitted count is within the bucket size
    admitted.foreach { a => a should be <= 20L }
  }
}
