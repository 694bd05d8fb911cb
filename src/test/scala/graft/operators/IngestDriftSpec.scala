package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q185: ingest-order drift localization. A mid-crawl distribution
  * shift must land on exactly the cohorts that shipped after it — the
  * planted corpus moves its lengths at the 80% ingest mark, so deciles
  * 0–7 read un-flagged and 8–9 flagged, with an independent integer
  * replay agreeing on every emd_u. */
class IngestDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a mid-crawl shift flags exactly the post-shift cohorts; " +
      "independent replay agrees") {
    import spark.implicits._
    // doc_ids 0..999: lengths 100..109 before id 800, 300..309 after —
    // the crawl's content changed at 80%. The shifted mass is kept at
    // 20% so the corpus MIXTURE stays near the pre-shift body (a
    // majority-shifted corpus drags the mixture toward itself and
    // flags every cohort — the dilution the thresholds are sized for).
    val docs = (0L until 1000L).map { id =>
      val len = if (id < 800) 100L + id % 10 else 300L + id % 10
      (id, "x", "en", "s0", len)
    }
    val dir = Files.createTempDirectory("ingest_").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q185_ingest_drift")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    got.keySet shouldBe (0L to 9L).toSet
    got.values.map(_._1).toSeq.distinct shouldBe Seq(100L)

    // pre-shift cohorts: ~0.2 ECDF gap over ~200 chars ≈ 40 chars of
    // mean displacement — under the flag line; post-shift cohorts:
    // ~0.8 gap over the same span ≈ 160 chars — flagged
    (0L to 7L).foreach { d => withClue(s"decile $d: ")(
      got(d)._3 shouldBe false) }
    (8L to 9L).foreach { d => withClue(s"decile $d: ")(
      got(d)._3 shouldBe true) }

    // independent integer replay (q176's arithmetic, deciles as keys)
    val values = docs.map(_._5).distinct.sorted
    val ctot = docs.size.toLong
    val expected = docs.groupBy(d => d._1 * 10 / 1000).map {
      case (dec, rows) =>
        val stot = rows.size.toLong
        var scum = 0L; var ccum = 0L; var emd = 0L
        values.indices.foreach { i =>
          scum += rows.count(_._5 == values(i))
          ccum += docs.count(_._5 == values(i))
          val dgap = math.abs(1000000L * scum / stot -
            1000000L * ccum / ctot)
          if (i + 1 < values.size) emd += dgap * (values(i + 1) - values(i))
        }
        dec -> emd
    }
    got.view.mapValues(_._2).toMap shouldBe expected
  }
}
