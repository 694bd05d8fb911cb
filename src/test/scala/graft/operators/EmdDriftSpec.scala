package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q176's Wasserstein statistic is pinned two ways: an independent
  * driver-side replay of the exact integer ECDF-integral math must
  * agree on a planted corpus, and the planted geometry must show the
  * property that JUSTIFIES a second drift statistic — two sources both
  * fully displaced from the corpus body read (near-)identical KS (the
  * max gap saturates), while EMD separates them by HOW FAR the mass
  * moved. */
class EmdDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((src, len), i) =>
      (i.toLong, "x", "en", src, len)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Independent replay of q176's exact integer ECDF-integral math. */
  private def emdRef(docs: Seq[(String, Long)]): Map[String, Long] = {
    val values = docs.map(_._2).distinct.sorted
    val ctot = docs.size.toLong
    docs.groupBy(_._1).map { case (src, rows) =>
      val stot = rows.size.toLong
      var scum = 0L; var ccum = 0L; var emd = 0L
      values.indices.foreach { i =>
        val v = values(i)
        scum += rows.count(_._2 == v)
        ccum += docs.count(_._2 == v)
        val d = math.abs(1000000L * scum / stot - 1000000L * ccum / ctot)
        if (i + 1 < values.size) emd += d * (values(i + 1) - v)
      }
      src -> emd
    }
  }

  test("independent replay agrees; equal-KS sources separate by " +
      "displacement distance") {
    // sBulk carries the corpus body at 100..109. sNear and sFar are
    // both ENTIRELY outside it — the KS max-gap saturates at the
    // corpus' below-me mass for both — but sNear sits 40 chars out and
    // sFar 140: only the mass-weighted integral tells them apart.
    val docs =
      (0 until 200).map(i => ("sBulk", 100L + i % 10)) ++
        (0 until 10).map(i => ("sNear", 140L + i % 10)) ++
        (0 until 10).map(i => ("sFar", 240L + i % 10))
    val dir = Files.createTempDirectory("emd_").toString
    write(dir, docs)

    val got = SparkEntry.queries("q176_emd_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    got.view.mapValues(_._2).toMap shouldBe emdRef(docs)
    got("sBulk")._1 shouldBe 200L // n_docs carried through

    // KS reads the two displaced sources as near-identical (the gap
    // saturates once the distributions are disjoint)...
    val ks = SparkEntry.queries("q154_ks_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val ksDelta = math.abs(ks("sNear") - ks("sFar"))
    ksDelta.toDouble / ks("sNear") should be < 0.1
    // ...while EMD scales with the displacement (~140 vs ~40 chars of
    // travel, diluted identically by the corpus mixture).
    got("sFar")._2.toDouble / got("sNear")._2 should be > 2.5
  }

  test("ordering is by integral drift, not worst-point drift") {
    // sWide: same mean as the corpus body but twice the spread —
    // nonzero KS, small integral. sShift: whole body moved far right —
    // EMD must rank it first. sShift is kept SMALL so the corpus
    // mixture stays ≈ the body (a large outlier source drags the
    // mixture toward itself and inflates every other source's EMD —
    // the dilution test 1 exercises deliberately).
    val docs =
      (0 until 100).map(i => ("sBody", 200L + i % 20)) ++
        (0 until 50).map(i => ("sWide", 190L + i % 40)) ++
        (0 until 10).map(i => ("sShift", 400L + i % 20))
    val dir = Files.createTempDirectory("emd2_").toString
    write(dir, docs)
    val rows = SparkEntry.queries("q176_emd_drift")(spark, dir).collect()
    rows.map(_.getString(0)).head shouldBe "sShift"
    val got = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    got shouldBe emdRef(docs)
    got("sShift") should be > (5L * got("sWide"))
  }
}
