package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q197: bigram conditional entropy per source. A deterministic
  * alternation reads exactly 0 (every transition is forced) however
  * rich its unigram profile; a branching source reads the exact
  * micro-nat mixture — the order statistic the unigram family
  * (q128/q190) cannot see. */
class CondEntropySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("forced transitions read 0; a 2-way branch reads exact micro-nats") {
    import spark.implicits._
    val dir = Files.createTempDirectory("condent_").toString
    val docs = Seq(
      (0L, "a b a b a", "srcDet"), // ab,ba,ab,ba — all transitions forced
      (1L, "a b a c", "srcMix"))   // from 'a': b or c — one bit of branch
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q197_cond_entropy")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

    got("srcDet") shouldBe ((4L, 2L, 0L))
    // terms: c(ab)=1 → ln 2, c(ac)=1 → ln 2, c(ba)=1 → ln 1;
    // (693147 + 693147) // 3 = 462098
    got("srcMix") shouldBe ((3L, 3L, 462098L))
    SparkEntry.queries("q197_cond_entropy")(spark, dir).collect()
      .map(_.getString(0)).toSeq shouldBe Seq("srcMix", "srcDet")
  }
}
