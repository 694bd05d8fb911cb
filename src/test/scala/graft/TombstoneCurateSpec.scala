package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Similarity
import graft.pipeline.HashScorer

/** `Curate --with-tombstones` must ship the corpus AS IF the deleted
  * documents never existed: tombstoned ids are a hard filter (never
  * shipped), a cluster whose canonical is deleted ships its re-elected
  * minimum surviving twin instead of losing the content, a fully
  * deleted cluster vanishes, and the q139 blast-radius audit ships
  * alongside the corpus. The default path (no flag) ships the deleted
  * canonical itself — the contrast that proves the repair is real. */
class TombstoneCurateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private def doc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
      .mkString(" ")

  // A source whose hash weight is 1000 milli ⇒ the mixing coin always
  // admits — the planted cluster's fate depends only on the stages
  // under test, not on per-id coin flips.
  private val fullSource = (0 to 99).map(i => s"feed$i")
    .find(s => HashScorer.md5u32(s) % 4 == 3).get

  private def writeCorpus(dir: String): Unit = {
    import spark.implicits._
    // Cluster X {46, 50, 53}: the CC canonical is the MINIMUM id, so
    // the tombstoned doc must be the min — 46 (46 % 23 == 0, and
    // 46 % 17 != 0 keeps the cluster clear of the eval slice).
    // Cluster Y {69, 92}: both ids tombstoned — the content vanishes.
    // The rest are unique filler off the %23 grid.
    val clusterX = Seq(46L, 50L, 53L).map(id => (id, doc(500)))
    val clusterY = Seq(69L, 92L).map(id => (id, doc(600)))
    val used = (clusterX ++ clusterY).map(_._1).toSet
    val unique = (1L until 45L).filterNot(used)
      .filterNot(_ % 23 == 0).take(25).map(id => (id, doc(id.toInt)))
    (clusterX ++ clusterY ++ unique).map { case (id, t) =>
      (id, t, "en", fullSource, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // Hash-pseudo-random embeddings: pairwise near-orthogonal in 64
    // dims, so the semantic dedup stage finds no clusters to confound
    // the text-cluster re-election under test.
    (0L until 10L).map { i =>
      (i, (0 until Similarity.Dim)
        .map(j => (HashScorer.md5u32(s"$i:$j") % 2001 - 1000).toFloat / 1000f)
        .toArray,
        (i % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  test("tombstoned canonicals re-elect; fully deleted clusters vanish; " +
      "the audit ships; the default path ships the deleted id") {
    val dir = Files.createTempDirectory("tombcur_").toString
    writeCorpus(dir)

    val outDefault = s"$dir/out_default"
    Curate.run(spark, dir, outDefault)
    val shippedDefault = spark.read.parquet(s"$outDefault/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Default: cluster X ships through its canonical 46.
    shippedDefault should contain(46L)
    shippedDefault should not contain 50L

    graft.operators.Features.clear(spark)
    val out = s"$dir/out_tomb"
    Curate.run(spark, dir, out, withTombstones = true)
    val shipped = spark.read.parquet(s"$out/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // Hard filter: no tombstoned id ships.
    shipped.foreach(_ % 23 should not be 0L)
    // Re-election: cluster X ships through 50 (min surviving), not 53.
    shipped should contain(50L)
    shipped should not contain 53L
    // Cluster Y had no survivors — its content is gone entirely.
    shipped should not contain 69L
    shipped should not contain 92L
    // Every non-cluster shipped id matches between the two runs apart
    // from the tombstone filter and the re-election: the repair
    // touches ONLY orphaned clusters.
    (shippedDefault -- Set(46L, 69L)) shouldBe (shipped - 50L)

    // The compliance audit ships alongside the corpus.
    val audit = spark.read.json(s"$out/report_tombstones")
    audit.count() shouldBe 1L
    audit.select("n_handoffs").head.getLong(0) should be >= 1L
  }
}
