package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-failure test for the q100 drift monitor: a corpus where one
  * source's vectors came from a "different encoder" (here: the global
  * direction negated plus noise) must surface with a sharply negative
  * drift cosine while healthy sources stay near +1 — the alarm fires on
  * the poisoned feed and ONLY on it.
  */
class EmbeddingDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("a source encoded against the corpus direction scores strongly " +
      "negative drift; aligned sources stay near +1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("drift_").toString

    // 3 sources × 30 vectors in 64-dim: srcA/srcB share a dominant
    // direction (+e0 with deterministic jitter); srcC is the same
    // magnitude but NEGATED — the mis-encoded feed.
    val rows = (0 until 90).map { i =>
      val src = s"src${i % 3}"
      val sign = if (i % 3 == 2) -1.0f else 1.0f
      val jitter = (j: Int) => (((i * 31 + j * 17) % 97) - 48) / 1000.0f
      val emb = Array.tabulate(64)(j =>
        sign * (if (j == 0) 1.0f else 0.02f) + jitter(j))
      (i.toLong, src, emb)
    }
    rows.map { case (id, s, _) => (id, s"doc $id text", "en", s, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    rows.map { case (id, _, e) => (id, e, (id % 10).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val drift = SparkEntry.queries("q100_embedding_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    drift.keySet shouldBe Set("src0", "src1", "src2")
    // healthy feeds: close to the global direction (which the poisoned
    // third pulls slightly off +e0, so "near 1" not "== 1")
    drift("src0") should be > 800000L
    drift("src1") should be > 800000L
    // the mis-encoded feed: strongly anti-aligned
    drift("src2") should be < -800000L
  }
}
