package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted fixtures for the two source-valuation reports.
  *
  * q122 (marginal novelty): a reseller feed that only re-ships content
  * an earlier-ordered feed already contributed must price at ZERO
  * novelty, while the feeds it copies from (and a genuinely fresh feed)
  * price at full novelty — the greedy first-owner attribution.
  *
  * q123 (soft-dedup weights): a 4-copy near-dup cluster must carry
  * exactly one unit of effective mass in total (4 × ⌊10⁶/4⌋), while
  * singleton docs carry 10⁶ each — the Σ 1/m effective-corpus-size
  * arithmetic, exact in int64 micro-units.
  */
class SourceValuationSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("q122: a reseller feed prices at zero novelty, first owners at full") {
    import spark.implicits._
    val dir = Files.createTempDirectory("novelty_").toString

    val origA = "alpha beta gamma delta epsilon zeta eta theta"
    val origA2 = "iota kappa lambda mu nu xi omicron pi"
    val fresh = "rho sigma tau upsilon phi chi psi omega"
    val rows = Seq(
      (0L, origA, "en", "a_first", origA.length.toLong),
      (1L, origA2, "en", "a_first", origA2.length.toLong),
      // the reseller: ships ONLY a_first's content, nothing of its own
      (2L, origA, "en", "b_reseller", origA.length.toLong),
      (3L, origA2, "en", "b_reseller", origA2.length.toLong),
      (4L, fresh, "en", "c_fresh", fresh.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q122_source_novelty")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    out.keySet shouldBe Set("a_first", "b_reseller", "c_fresh")
    // a_first owns everything it ships (it precedes the reseller)
    out("a_first")._3 shouldBe 1000000L
    // the reseller contributes nothing at its position in the order
    out("b_reseller") shouldBe ((out("a_first")._1, 0L, 0L))
    // a genuinely fresh feed prices at full novelty
    out("c_fresh")._3 shouldBe 1000000L
  }

  test("q123: a 4-copy cluster carries one unit of effective mass; " +
      "singletons carry 10^6 each") {
    import spark.implicits._
    val dir = Files.createTempDirectory("softdedup_").toString

    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val solo1 = "completely different text about spark catalyst plans here now"
    val solo2 = "another unrelated document mentioning parquet shuffles and joins"
    val rows = Seq(
      (0L, dup, "en", "src_dup", dup.length.toLong),
      (1L, dup, "en", "src_dup", dup.length.toLong),
      (2L, dup, "en", "src_dup", dup.length.toLong),
      (3L, dup, "en", "src_dup", dup.length.toLong),
      (4L, solo1, "en", "src_solo", solo1.length.toLong),
      (5L, solo2, "en", "src_solo", solo2.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q123_soft_dedup_weights")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // 4 copies, all clustered: effective mass = 4·⌊10⁶/4⌋ = exactly 10⁶
    out("src_dup") shouldBe ((4L, 4L, 1000000L))
    // 2 distinct docs, no cluster: full weight each
    out("src_solo") shouldBe ((2L, 0L, 2000000L))
  }
}
