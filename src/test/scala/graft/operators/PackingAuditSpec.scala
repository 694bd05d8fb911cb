package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Exact-arithmetic test for the q102 packing-efficiency audit against
  * hand-computed packings: a source of exact-budget documents packs
  * with zero waste and zero straddles; a source of 300-token documents
  * has one boundary-crossing document and a known pad count.
  */
class PackingAuditSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(n: Int): String = Seq.fill(n)("t").mkString(" ")

  test("bin counts, waste, fill ratio, and straddles match the " +
      "hand-computed packing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pack_").toString

    // s0: 4 docs x 512 tokens — perfect packing (4 bins, no waste,
    // every doc starts on a boundary). s1: 3 docs x 300 tokens —
    // 900 tokens => 2 bins, 124 pad tokens; doc 1 spans 300..599,
    // crossing the 512 boundary (the only straddle).
    val rows =
      (0 until 4).map(i => (i.toLong, doc(512), "en", "s0", 1L)) ++
        (0 until 3).map(i => (10L + i, doc(300), "en", "s1", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q102_packing_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap

    out("s0") shouldBe ((4L, 2048L, 4L, 0L, 1000000L, 0L))
    // fill = floor(1e6 * 900 / 1024) = 878906
    out("s1") shouldBe ((3L, 900L, 2L, 124L, 878906L, 1L))
  }
}
