package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q139's blast radius must be exactly the planted cascade: with the
  * `% 23` deletion set hitting (a) a cluster's canonical while members
  * survive, (b) a whole cluster, and (c) a non-canonical member, the
  * audit reports one handoff, one dissolution, and three touched
  * clusters — with chunk, vector, and shard-cell counts reconciling
  * against closed-form arithmetic and an independent hash
  * reimplementation. */
class DeletionCascadeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private def doc(seed: Int): String = // 40 tokens ⇒ 2 chunks (32/24)
    (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
      .mkString(" ")

  test("planted handoff / dissolution / member-loss clusters and the " +
      "derived-artifact counts all reconcile") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delcasc_").toString

    // Deletion set = doc_id % 23 == 0 ⇒ {0, 23, 46, 69} in range.
    val clusterA = Seq(0L, 5L, 7L).map(id => (id, doc(500)))   // handoff
    val clusterB = Seq(23L, 46L).map(id => (id, doc(600)))     // dissolved
    val clusterC = Seq(3L, 69L).map(id => (id, doc(700)))      // touched only
    val clusterD = Seq(9L, 11L).map(id => (id, doc(800)))      // untouched
    val used = (clusterA ++ clusterB ++ clusterC ++ clusterD).map(_._1).toSet
    val unique = (0L until 90L).filterNot(used)
      .filterNot(_ % 23 == 0).take(20).map(id => (id, doc(id.toInt)))
    val all = clusterA ++ clusterB ++ clusterC ++ clusterD ++ unique
    all.map { case (id, t) => (id, t, "en", s"src${id % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // Vectors for ids 0..19 ⇒ only doc 0's vector is purged.
    (0L until 20L).map(i => (i, Array.fill(Similarity.Dim)(0.5f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val row = SparkEntry.queries("q139_deletion_cascade")(spark, dir)
      .collect().head
    row.getLong(0) shouldBe 4L // n_deleted: 0, 23, 46, 69
    row.getLong(1) shouldBe 3L // clusters A, B, C touched
    row.getLong(2) shouldBe 1L // A: canonical 0 deleted, 5/7 survive
    row.getLong(3) shouldBe 1L // B erased
    row.getLong(4) shouldBe 8L // 4 deleted docs × 2 chunks each
    // Cross-pin the closed form against the REAL chunker: if q104's
    // constants ever change, this line fails alongside the hand count.
    row.getLong(4) shouldBe TextAnalysis.chunksOf(
      graft.Tables.documents(spark, dir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 23 === 0))
      .count()
    row.getLong(5) shouldBe 1L // vec 0 only
    // Shard cells: independent reimplementation of the q111 assignment.
    val expectCells = (for {
      id <- Seq(0L, 23L, 46L, 69L); ep <- 0L until 4L
    } yield (ep, graft.pipeline.HashScorer.md5u32(s"$id#ep$ep") % 32L)).toSet
    row.getLong(6) shouldBe expectCells.size.toLong

    // q140's re-election table IS the handoff set: exactly cluster A,
    // re-elected to its minimum surviving id.
    val handoffs = SparkEntry.queries("q140_canonical_handoff")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    handoffs shouldBe Array((0L, 5L, 2L, 3L))
    handoffs.length.toLong shouldBe row.getLong(2)
  }

  test("with nothing deleted in range the audit is all zeros") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delcasc0_").toString
    // ids 1..22 — no multiples of 23, one dup pair (non-deleted).
    val docs = (1L to 22L).map(id =>
      (id, if (id <= 2) doc(900) else doc(id.toInt)))
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    (1L until 5L).map(i => (i, Array.fill(Similarity.Dim)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val row = SparkEntry.queries("q139_deletion_cascade")(spark, dir)
      .collect().head
    (0 until 7).map(row.getLong) shouldBe Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L)
  }
}
