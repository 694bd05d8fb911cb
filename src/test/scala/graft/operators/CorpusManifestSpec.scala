package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q151's checksum is the corpus change detector, so the properties
  * that make it trustworthy are pinned directly: partition/order
  * invariance (XOR is commutative), sensitivity to a single-character
  * edit, and no cancellation between byte-identical duplicate
  * documents (the hash covers the (doc_id, text) pair). */
class CorpusManifestSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[(Long, String)],
      parts: Int): Unit = {
    import spark.implicits._
    docs.map { case (id, text) =>
      (id, text, "en", if (id < 100L) "sA" else "sB", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def manifest(dir: String): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("q151_corpus_manifest")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(6), r.getLong(7))))
      .toMap

  private val base = Seq(
    1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "zeta eta",
    101L -> "one two three", 102L -> "four five")

  test("checksum is invariant under partitioning and row order") {
    val d1 = Files.createTempDirectory("man1_").toString
    val d2 = Files.createTempDirectory("man2_").toString
    write(d1, base, parts = 1)
    write(d2, scala.util.Random.shuffle(base), parts = 5)
    manifest(d1) shouldBe manifest(d2)
  }

  test("a single-character edit moves exactly that source's checksum") {
    val d1 = Files.createTempDirectory("man3_").toString
    val d2 = Files.createTempDirectory("man4_").toString
    write(d1, base, parts = 2)
    write(d2, base.map { case (id, t) =>
      if (id == 2L) id -> (t + "!") else id -> t }, parts = 2)
    val (m1, m2) = (manifest(d1), manifest(d2))
    m1("sA")._3 should not be m2("sA")._3
    m1("sA")._4 should not be m2("sA")._4 // second lane moves too
    m1("sB") shouldBe m2("sB")
  }

  test("manifest diff classifies all four statuses, including the " +
      "same-count in-place edit row counts cannot see") {
    import spark.implicits._
    def frame(docs: Seq[(Long, String, String)]) =
      docs.map { case (id, text, src) =>
        (id, text, "en", src, text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val stored = frame(Seq(
      (1L, "alpha", "sA"), (2L, "beta", "sA"),
      (10L, "gamma", "sB"),
      (20L, "delta", "sOld")))
    val current = frame(Seq(
      (1L, "alpHa", "sA"), (2L, "beta", "sA"), // same count, one edit
      (10L, "gamma", "sB"),                    // untouched
      (30L, "epsilon", "sNew")))               // brand-new source
    val got = TextAnalysis
      .manifestDiff(TextAnalysis.manifestOf(current),
        TextAnalysis.manifestOf(stored))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3))))
      .toMap
    got("sA") shouldBe (("changed", 0L, 0L)) // XOR sees what counts can't
    got("sB") shouldBe (("unchanged", 0L, 0L))
    got("sNew") shouldBe (("new", 1L, 7L))
    got("sOld") shouldBe (("removed", -1L, -5L))
  }

  test("byte-identical duplicate docs do not cancel out of the XOR") {
    val d1 = Files.createTempDirectory("man5_").toString
    val d2 = Files.createTempDirectory("man6_").toString
    write(d1, base, parts = 2)
    // Append TWO byte-identical copies of doc 1's text under new ids:
    // if the hash covered text alone they would XOR-cancel and leave
    // the checksum unchanged while n_docs moved.
    write(d2, base ++ Seq(4L -> "alpha beta gamma",
      5L -> "alpha beta gamma"), parts = 2)
    val (m1, m2) = (manifest(d1), manifest(d2))
    m2("sA")._1 shouldBe (m1("sA")._1 + 2)
    m1("sA")._3 should not be m2("sA")._3
  }
}
