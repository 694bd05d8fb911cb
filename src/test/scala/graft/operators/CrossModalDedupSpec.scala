package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q114's cross-modal dedup-consistency audit:
  * when embeddings track content, every verified text-dup pair agrees
  * in vector space (zero disagreement); replacing ONE copy's vector
  * with a stale anti-aligned one is caught as exactly the pair-count
  * that vector participates in; and a dup whose vector row is missing
  * is counted as unscored, not silently dropped.
  */
class CrossModalDedupSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private def doc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
      .mkString(" ")

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  private def vec(sign: Float, jitterSeed: Int): Array[Float] =
    Array.tabulate(64) { j =>
      sign * (if (j == 0) 1.0f else 0.01f) +
        (((jitterSeed * 31 + j * 17) % 97) - 48) / 5000.0f
    }

  test("content-tracking vectors agree on every dup pair; one stale " +
      "vector is caught; a missing vector counts as unscored") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xmodal_").toString

    // 4 copies of one doc (ids 0-3) + 20 unique fillers (ids 4-23)
    val docs = (0L to 3L).map(id => (id, doc(100))) ++
      (4L until 24L).map(id => (id, doc(id.toInt)))
    writeDocs(dir, docs)
    // embeddings: copies share the +e0 direction with small jitter —
    // EXCEPT id 3, whose vector is stale (anti-aligned); id 2 has NO
    // vector row at all. Fillers get distinct near-orthogonal vectors.
    val embRows =
      Seq((0L, vec(1.0f, 0)), (1L, vec(1.0f, 1)), (3L, vec(-1.0f, 3))) ++
      (4L until 24L).map { id =>
        (id, Array.tabulate(64)(j =>
          (if (j == (id % 60 + 4).toInt) 1.0f else 0.0f) +
            (((id * 13 + j * 7) % 89) - 44).toFloat / 5000.0f))
      }
    embRows.map { case (id, e) => (id, e, (id % 10).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val r = SparkEntry.queries("q114_crossmodal_dedup")(spark, dir).head()
    // 4 copies → C(4,2) = 6 verified text pairs
    r.getAs[Long]("n_text_pairs") shouldBe 6L
    // id 2 has no vector: its 3 pairs are unscored, the rest scored
    r.getAs[Long]("n_unscored") shouldBe 3L
    r.getAs[Long]("n_scored") shouldBe 3L
    // the stale id-3 vector disagrees on both its scored pairs
    // (0,3) and (1,3); the healthy pair (0,1) agrees
    r.getAs[Long]("n_disagree") shouldBe 2L
    r.getAs[Long]("min_cos_u") should be < 0L

    // control: with id 3 healthy too, zero disagreement
    val dir2 = Files.createTempDirectory("xmodal2_").toString
    writeDocs(dir2, docs)
    (Seq((0L, vec(1.0f, 0)), (1L, vec(1.0f, 1)), (2L, vec(1.0f, 2)),
      (3L, vec(1.0f, 3))) ++
      embRows.drop(3))
      .map { case (id, e) => (id, e, (id % 10).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir2/embeddings.parquet")
    val r2 = SparkEntry.queries("q114_crossmodal_dedup")(spark, dir2).head()
    r2.getAs[Long]("n_text_pairs") shouldBe 6L
    r2.getAs[Long]("n_scored") shouldBe 6L
    r2.getAs[Long]("n_disagree") shouldBe 0L
    r2.getAs[Long]("mean_cos_u") should be > 900000L
  }
}
