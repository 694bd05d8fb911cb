package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q154's KS statistic is pinned two ways: an independent driver-side
  * ECDF replay (same integer micro-unit math, plain Scala) must agree
  * on a planted corpus, and the planted geometry must rank a shifted
  * source far above an in-distribution one — including a shape change
  * PSI's fixed buckets could miss if the shift stays inside a bucket. */
class KsDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((src, len), i) =>
      (i.toLong, "x", "en", src, len)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Independent replay of q154's exact integer ECDF-gap math. */
  private def ksRef(docs: Seq[(String, Long)]): Map[String, Long] = {
    val values = docs.map(_._2).distinct.sorted
    val ctot = docs.size.toLong
    docs.groupBy(_._1).map { case (src, rows) =>
      val stot = rows.size.toLong
      var scum = 0L; var ccum = 0L; var ks = 0L
      values.foreach { v =>
        scum += rows.count(_._2 == v)
        ccum += docs.count(_._2 == v)
        val d = math.abs(1000000L * scum / stot - 1000000L * ccum / ctot)
        if (d > ks) ks = d
      }
      src -> ks
    }
  }

  test("planted shifted source dominates; independent ECDF replay agrees") {
    // sBulk: lengths 10..49 uniform; sSame: a sample of the same range;
    // sShift: everything 60..79 — fully displaced mass.
    val docs =
      (0 until 80).map(i => ("sBulk", 10L + (i % 40))) ++
        (0 until 20).map(i => ("sSame", 10L + (i * 2) % 40)) ++
        (0 until 20).map(i => ("sShift", 60L + i % 20))
    val dir = Files.createTempDirectory("ks_").toString
    write(dir, docs)

    val got = SparkEntry.queries("q154_ks_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ref = ksRef(docs)

    got.view.mapValues(_._2).toMap shouldBe ref
    got("sBulk")._1 shouldBe 80L // n_docs carried through
    // the displaced source maxes out near its full mass share
    got("sShift")._2 should be > got("sSame")._2
    got("sShift")._2 should be > 800000L // ECDF gap ≈ 5/6 at v=49
  }

  test("an inside-the-bucket shape change is visible: same PSI octave, " +
      "different ECDF") {
    // Both sources live entirely in [100, 140) — one clusters at the
    // low edge, one at the high edge. A bucket scheme whose bucket
    // spans [100, 140) reads them as identical; KS separates them.
    val docs =
      (0 until 50).map(i => ("sLow", 100L + i % 5)) ++
        (0 until 50).map(i => ("sHigh", 135L + i % 5))
    val dir = Files.createTempDirectory("ks2_").toString
    write(dir, docs)
    val got = SparkEntry.queries("q154_ks_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    got shouldBe ksRef(docs)
    // each source's ECDF reaches 1 while the corpus sits at 1/2
    got("sLow") shouldBe 500000L
    got("sHigh") shouldBe 500000L
  }
}
