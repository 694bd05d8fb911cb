package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q161's canonicalization ladder, pinned on a corpus planted so each
  * tier finds a DIFFERENT duplicate: a byte-identical pair (raw), a
  * case-variant pair only normalization collapses, and a word-order
  * pair only the token bag collapses — the two canonicalizers coarsen
  * along different axes, and the spec separates their lifts exactly. */
class NormLiftSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("per-tier dup mass and lifts exact on a planted source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello World"),   // case variant of 2 — norm collapses,
      (2L, "hello world"),   //   bag does NOT (tokens keep case)
      (3L, "b a"),           // order variant of 4 — bag collapses,
      (4L, "a b"),           //   norm does NOT (order preserved)
      (5L, "same text"),     // byte-identical pair: every tier sees it
      (6L, "same text"))
    val dir = Files.createTempDirectory("normlift_").toString
    docs.map { case (id, text) => (id, text, "en", "sA", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = SparkEntry.queries("q161_norm_lift")(spark, dir).collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def v(n: String): Long = r.getLong(byName(n))

    r.getString(byName("source")) shouldBe "sA"
    v("n_docs") shouldBe 6L
    v("dup_raw") shouldBe 1L   // only (5,6)
    v("dup_norm") shouldBe 2L  // (5,6) + (1,2)
    v("dup_bag") shouldBe 2L   // (5,6) + (3,4)
    v("lift_norm") shouldBe 1L
    v("lift_bag") shouldBe 1L
  }
}
