package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q198: Spearman length↔richness correlation per source. Planted
  * monotone, tied, and maximally-inverted rank patterns with exact
  * rational values; ties resolve by doc_id in BOTH rank passes (the
  * documented deterministic variant). */
class RankCorrSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("monotone +1, doc_id-tied +1, inverted-rank exact negative") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rankcorr_").toString
    val docs = Seq(
      // richness grows with length: ranks agree, d = 0 everywhere
      (0L, "x", "mono"), (1L, "y y", "mono"), (2L, "z z z", "mono"),
      // identical measures: both rank passes fall back to doc_id
      (3L, "a a", "tie"), (4L, "b b", "tie"),
      // the longest doc is the POOREST: length ranks B<C<A, type
      // ranks A<B<C → d = (2,−1,−1), Σd² = 6, ρ = 1 − 36/24 = −1/2
      (5L, "a a a a", "anti"), (6L, "b c", "anti"), (7L, "d e f", "anti"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q198_rank_corr")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

    got("mono") shouldBe ((3L, 0L, 1000000L))
    got("tie") shouldBe ((2L, 0L, 1000000L))
    got("anti") shouldBe ((3L, 6L, -500000L))
    SparkEntry.queries("q198_rank_corr")(spark, dir).collect()
      .map(_.getString(0)).toSeq shouldBe Seq("mono", "tie", "anti")
  }
}
