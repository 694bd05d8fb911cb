package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q110's duplication-profile histogram: a
  * corpus with one 20-copy flood, one 3-copy group, one 2-copy pair,
  * and 30 unique documents must land exactly one cluster in each of
  * the `17+`, `3-4`, and `2` bands and count every unique doc as a
  * singleton — and the bands must partition the corpus (every doc
  * counted exactly once).
  */
class DupHistogramSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("planted 20/3/2-copy groups land in their bands; bands " +
      "partition the corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("hist_").toString

    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def doc(seed: Int): String =
      (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
        .mkString(" ")

    val flood = (0 until 20).map(i => (i.toLong, doc(100)))   // 20 copies
    val triple = (20 until 23).map(i => (i.toLong, doc(200))) // 3 copies
    val pair = (23 until 25).map(i => (i.toLong, doc(300)))   // 2 copies
    val unique = (25 until 55).map(i => (i.toLong, doc(i)))
    (flood ++ triple ++ pair ++ unique).map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q110_dup_histogram")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    out("17+") shouldBe ((1L, 20L))
    out("3-4") shouldBe ((1L, 3L))
    out("2") shouldBe ((1L, 2L))
    out("1") shouldBe ((30L, 30L))
    out.keySet shouldBe Set("1", "2", "3-4", "17+")
    // the bands partition the corpus: every doc counted exactly once
    out.values.map(_._2).sum shouldBe 55L
  }
}
