package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-mass tests for the two cost-view reports: q120 must weigh
  * dedup savings by TOKENS (a feed dropping a third of its docs can be
  * dropping 8% of its token mass), and q121 must count the cross-doc
  * chunk collisions a hash-keyed vector index skips re-embedding. */
class DedupSavingsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(id: Long, src: String, text: String) =
    (id, text, "en", src, text.length.toLong)

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("q120: token savings diverge from doc drop rate by length") {
    import spark.implicits._
    val dir = Files.createTempDirectory("savings_").toString

    val long = words("la", 100)
    val short = words("sb", 10)
    // srcA: a 100-token doc + its exact copy → 1/2 docs, 1/2 tokens.
    // srcB: a unique 100-token doc + a duplicated 10-token pair →
    //   1/3 docs dropped but only 10/120 of the token mass.
    Seq(doc(0L, "srcA", long), doc(1L, "srcA", long),
        doc(2L, "srcB", words("lbx", 100)),
        doc(3L, "srcB", short), doc(4L, "srcB", short))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q120_dedup_savings")(spark, dir)
      .select("source", "n_docs", "total_tokens", "dropped_tokens",
        "savings_u")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    rows("srcA") shouldBe (("srcA", 2L, 200L, 100L, 500000L))
    rows("srcB") shouldBe (("srcB", 3L, 120L, 10L, 83333L))
    // The doc-rate view (q70) reads 1/3 for srcB — the token view is
    // the one a training-budget owner needs.
  }

  test("q121: identical docs collide on every chunk; unique docs on none") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chunkdup_").toString

    val shared = words("tpl", 60) // 60 tokens → 3 chunks of 32/24
    Seq(doc(0L, "srcA", shared), doc(1L, "srcA", shared),
        doc(2L, "srcB", words("uq", 60)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q121_chunk_dedup_rate")(spark, dir)
      .select("source", "n_chunks", "n_dup_chunks", "dup_rate_u")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows("srcA")._3 shouldBe rows("srcA")._2 // every chunk collides
    rows("srcA")._4 shouldBe 1000000L
    rows("srcB")._3 shouldBe 0L
    rows("srcB")._4 shouldBe 0L
  }
}
