package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q146 must separate the hub shape from the cluster shape: a template
  * document sharing ≥ 0.5 Jaccard with five pages that are pairwise
  * BELOW the threshold is one degree-5 hub plus five degree-1 leaves
  * (|C_i| in (|T|/2, |T|] makes exactly that geometry), while an exact
  * copy pair contributes two degree-1 docs — the banding q110's
  * component view cannot produce, since the hub's "component" never
  * transitively closes at this threshold. */
class DupDegreeSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("planted template hub lands in 5+ with max degree 5; leaves " +
      "and the copy pair land in band 1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dupdeg_").toString

    val t = (1 to 30).map(i => s"t$i").mkString(" ") // 28 shingles
    // Page i: T ++ 22 unique tokens ⇒ ~50 shingles;
    // J(T, P_i) = 28/50 = 0.56 >= 0.5; J(P_i, P_j) = 28/72 = 0.39 < 0.5.
    val pages = (1 to 5).map(i =>
      t + " " + (1 to 22).map(j => s"c${i}x$j").mkString(" "))
    val copy = (1 to 25).map(i => s"z$i").mkString(" ")
    val docs = Seq(100L -> t) ++
      pages.zipWithIndex.map { case (p, i) => (200L + i) -> p } ++
      Seq(300L -> copy, 301L -> copy) ++
      (400L to 409L).map(id => id ->
        (1 to 20).map(j => s"u${id}w$j").mkString(" "))
    docs.map { case (id, text) =>
      (id, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q146_dup_degree")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out("5+") shouldBe ((1L, 5L))   // the template hub
    out("1") shouldBe ((7L, 1L))    // 5 leaves + the copy pair
    out.keySet shouldBe Set("1", "5+")
  }
}
