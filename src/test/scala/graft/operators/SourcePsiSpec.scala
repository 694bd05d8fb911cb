package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-drift test for the q117 length-distribution PSI monitor:
  * sources sharing the corpus length profile sit in the stable band
  * (< 0.1), while a feed that silently switched to concatenated
  * documents (every doc several strides longer) crosses the
  * investigate threshold (> 0.25) and tops the triage list — the
  * "truncated/concatenated feed" failure q101's vocabulary KL cannot
  * see, because the words never changed. */
class SourcePsiSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a length-shifted source crosses the investigate band; " +
      "same-profile sources stay stable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("psi_").toString

    val word = "alpha"
    // srcA/srcB: lengths spread across buckets 0-3 (identical profile);
    // srcC: every doc in the open-top bucket (concatenation drift) —
    // same vocabulary, so only the length distribution moves.
    def docOfLen(id: Long, src: String, nChars: Long) = {
      val words = Seq.fill(((nChars + 5) / 6).toInt)(word).mkString(" ")
      (id, words.take(nChars.toInt), "en", src, nChars)
    }
    // The drifted feed is a SMALL fraction of the corpus (10/500): PSI
    // measures each source against the corpus mixture, so a drifted
    // feed that dominates the mixture would drag every stable source's
    // score up with it — exactly the production shape too (one bad
    // feed among many).
    val lens = Seq(40L, 100L, 170L, 230L)
    val rows =
      (0 until 245).map(i => docOfLen(i.toLong, "src0", lens(i % 4))) ++
        (245 until 490).map(i => docOfLen(i.toLong, "src1", lens(i % 4))) ++
        (490 until 500).map(i => docOfLen(i.toLong, "src2", 520L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val psi = SparkEntry.queries("q117_source_psi")(spark, dir)
      .select("source", "psi_u").as[(String, Long)].collect()
    psi.map(_._1).toSet shouldBe Set("src0", "src1", "src2")
    val bySrc = psi.toMap
    bySrc("src2") should be > 250000L // investigate band
    bySrc("src0") should be < 100000L // stable band
    bySrc("src1") should be < 100000L
    psi.head._1 shouldBe "src2" // worst-first ordering
  }
}
