package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q138's exposure must be exactly `epochs(source) × copies(content)`:
  * a feed carrying a 10-copy cluster crosses the 4-epoch risk line on
  * exactly those 10 documents even though q103 alone flags nothing
  * (every per-source epoch count stays under the cliff), and on a
  * dup-free corpus the audit collapses to the allocator (total =
  * n_docs · epochs_u, max = epochs_u, zero at risk).
  */
class RepetitionExposureSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private def doc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
      .mkString(" ")

  /** Two sources, 20 docs × 40 tokens each (equal token masses, so
    * epochs_u = 4·w/wsum ≤ 3.2e6 < the 4e6 cliff for any hash
    * weight); `dupfeed` docs 0-9 are one 10-copy cluster. */
  private def writeCorpus(dir: String, withDups: Boolean): Unit = {
    import spark.implicits._
    val dup = (0 until 20).map { i =>
      val t = if (withDups && i < 10) doc(500) else doc(i)
      (i.toLong, t, "dupfeed")
    }
    val clean = (20 until 40).map(i => (i.toLong, doc(100 + i), "cleanfeed"))
    (dup ++ clean).map { case (id, t, src) =>
      (id, t, "en", src, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  private def epochsU(dir: String): Map[String, Long] =
    SparkEntry.queries("q103_epoch_allocator")(spark, dir)
      .select("source", "epochs_u").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def run(dir: String): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("q138_repetition_exposure")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("a 10-copy cluster puts exactly its members over the 4-epoch " +
      "line; totals reconcile against the allocator arithmetic") {
    val dir = Files.createTempDirectory("expo_").toString
    writeCorpus(dir, withDups = true)
    val e = epochsU(dir)
    // Pre-condition of the scenario: the allocator alone is under the
    // cliff for BOTH feeds (equal masses ⇒ epochs_u ≤ 3.2e6).
    e.values.foreach(_ should be <= 4000000L)
    val out = run(dir)
    val (nd, risk, mx, tot) = out("dupfeed")
    nd shouldBe 20L
    // 10 copies × epochs ≥ 0.8e6 each ⇒ always over 4e6; uniques never.
    risk shouldBe 10L
    mx shouldBe 10L * e("dupfeed")
    tot shouldBe (10L + 100L) * e("dupfeed") // 10 uniques + 10 docs at 10×
    val (cnd, crisk, cmx, ctot) = out("cleanfeed")
    cnd shouldBe 20L
    crisk shouldBe 0L
    cmx shouldBe e("cleanfeed")
    ctot shouldBe 20L * e("cleanfeed")
  }

  test("dup-free corpus collapses to the allocator: total = n·epochs, " +
      "max = epochs, zero at risk") {
    val dir = Files.createTempDirectory("expo0_").toString
    writeCorpus(dir, withDups = false)
    val e = epochsU(dir)
    run(dir).foreach { case (src, (nd, risk, mx, tot)) =>
      nd shouldBe 20L
      risk shouldBe 0L
      mx shouldBe e(src)
      tot shouldBe 20L * e(src)
    }
  }
}
