package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions.col
import org.scalatest.Assertions.fail

import graft.{SparkEntry, SparkSpec}

/** The q116 cross-split leakage audit must catch what q83's
  * content-stable split cannot prevent: a NEAR-duplicate pair (distinct
  * content fingerprints, so the two docs hash independently) separated
  * by the train/test boundary. Exact duplicates, by contrast, share a
  * fingerprint and can never cross. */
class SplitLeakageSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a planted near-dup pair straddling splits surfaces as " +
      "cross_split; exact duplicates never cross") {
    import spark.implicits._
    val dir = Files.createTempDirectory("leak_").toString

    // A long shared base (100 words) so a one-word suffix change keeps
    // ~98% shingle overlap — a certain MinHash verify hit — while
    // changing the content fingerprint (and therefore the split
    // bucket, independently).
    val base = (0 until 100).map(i => s"tok${i % 83}z").mkString(" ")
    val baseSplit = Seq(base).toDF("text")
      .select(TextAnalysis.splitAssign.as("s")).as[String].head()
    // Find a near-identical variant landing in a DIFFERENT split.
    val variants = (0 until 40).map(i => s"$base leak$i")
    val variantSplits = variants.toDF("text")
      .select(col("text"), TextAnalysis.splitAssign.as("s"))
      .as[(String, String)].collect()
    val crosser = variantSplits.find(_._2 != baseSplit).getOrElse(
      fail("no variant crossed the split boundary"))._1

    def doc(id: Long, text: String) =
      (id, text, "en", "src0", text.length.toLong)
    // Fillers keep the corpus from being one giant near-dup clique —
    // each is a distinct vocabulary, no shared shingles with the pair.
    val fillers = (10 until 20).map(i =>
      doc(i.toLong, (0 until 40).map(j => s"f${i}w$j").mkString(" ")))
    (Seq(doc(0L, base), doc(1L, crosser), doc(2L, base)) ++ fillers)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q116_split_leakage")(spark, dir)
      .select("split_lo", "split_hi", "n_pairs", "cross_split")
      .as[(String, String, Long, Boolean)].collect()

    // The planted boundary-straddling near-dup pair is visible (docs 0
    // and 1, and 2 with 1): cross rows exist and carry exactly those
    // pairs.
    val cross = rows.filter(_._4)
    cross should not be empty
    cross.map(_._3).sum shouldBe 2L // (0,1) and (1,2)
    // The exact duplicate (docs 0 and 2) shares a fingerprint → same
    // split by construction: its pair row is same-split.
    val same = rows.filter(!_._4)
    same.map(_._3).sum should be >= 1L
    same.foreach { case (lo, hi, _, _) => lo shouldBe hi }
  }
}
