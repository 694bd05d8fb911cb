package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{ManifestWriter, SparkEntry, SparkSpec}

/** q159's doc-level snapshot delta, pinned three ways: the planted
  * fixture's (source, status) table is hand-computed; the ARTIFACT path
  * (writeLedger → deltaAgainstStoredLedger) must equal the in-session
  * delta on the same simulated snapshot; and the `removed` class — which
  * the subset fixture cannot produce — is planted through the artifact
  * path, where the stored ledger carries docs the live corpus lacks. */
class DeltaLedgerSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String,
      docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("planted fixture: added / changed / unchanged per source, " +
      "char deltas exact") {
    // doc_id % 10 == 0 → added today; % 7 == 0 (and % 10 != 0) → edited
    // since the snapshot (stored text has an 'OLD ' 4-char prefix).
    // ids chosen to hit every class in both sources:
    //   sA: 10 (added), 14 (changed), 11 (unchanged)
    //   sB: 20 (added), 21 (changed: 21%7=0), 13 (unchanged)
    val docs = Seq(
      (10L, "sA", "ten chars!"), (14L, "sA", "fourteen"),
      (11L, "sA", "eleven"),
      (20L, "sB", "twenty"), (21L, "sB", "twentyone"),
      (13L, "sB", "thirteen"))
    val dir = Files.createTempDirectory("delta_").toString
    write(dir, docs)

    val got = SparkEntry.queries("q159_snapshot_delta")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    got shouldBe Map(
      ("sA", "added") -> ((1L, 10L)),      // doc 10: +10 chars
      ("sA", "changed") -> ((1L, -4L)),    // doc 14: stored had +4
      ("sA", "unchanged") -> ((1L, 0L)),
      ("sB", "added") -> ((1L, 6L)),       // doc 20: +6 chars
      ("sB", "changed") -> ((1L, -4L)),    // doc 21: stored had +4
      ("sB", "unchanged") -> ((1L, 0L)))
  }

  test("artifact path equals the in-session delta, and a stored doc " +
      "absent from the live corpus classifies removed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delta_art_").toString
    // live corpus: 3 docs
    write(dir, Seq(
      (1L, "sA", "alpha text"), (2L, "sA", "beta text"),
      (3L, "sB", "gamma text")))
    val live = graft.Tables.documents(spark, dir)

    // stored snapshot: doc 2 had different text, doc 9 has since been
    // deleted from the corpus, doc 1 unchanged; doc 3 had not arrived.
    val storedDocs = Seq(
      (1L, "alpha text", "en", "sA", 10L),
      (2L, "beta text OLD", "en", "sA", 13L),
      (9L, "long gone", "en", "sB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ledgerDir = Files.createTempDirectory("delta_led_").toString + "/ledger"
    ManifestWriter.writeLedger(storedDocs, ledgerDir)

    val viaArtifact =
      ManifestWriter.deltaAgainstStoredLedger(live, ledgerDir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap

    viaArtifact shouldBe Map(
      ("sA", "changed") -> ((1L, -4L)),    // doc 2: 9 vs 13 chars
      ("sA", "unchanged") -> ((1L, 0L)),   // doc 1
      ("sB", "added") -> ((1L, 10L)),      // doc 3
      ("sB", "removed") -> ((1L, -9L)))    // doc 9: stored mass leaves

    // and the artifact read-back is byte-faithful: re-deriving the
    // delta from the in-session ledger of the same stored docs agrees
    val inSession = TextAnalysis.ledgerDelta(
      TextAnalysis.docLedgerOf(live),
      TextAnalysis.docLedgerOf(storedDocs))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    viaArtifact shouldBe inSession
  }

  test("ledger width stays narrow: doc_id, source, fp, n_chars only") {
    import spark.implicits._
    val docs = Seq((1L, "t", "en", "sA", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TextAnalysis.docLedgerOf(docs).columns.toSeq shouldBe
      Seq("doc_id", "source", "fp", "n_chars")
  }
}
