package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The manifest artifact must be a faithful round-trip of q151 (write →
  * read preserves every fingerprint column bit-for-bit), and a diff
  * computed from the STORED artifact must equal the in-session q153
  * diff row-for-row — the "production reads the saved artifact" claim
  * as a pinned equality, not scaladoc prose. */
class ManifestWriterSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  test("write → read round-trips q151's manifest bit-for-bit") {
    val docs = Tables.documents(spark, dir)
    val out = Files.createTempDirectory("manifest_rt_").toString + "/m"
    val reread = ManifestWriter.write(docs, out).orderBy("source")
    val direct = SparkEntry.queries("q151_corpus_manifest")(spark, dir)
    reread.columns shouldBe direct.columns
    reread.collect().map(_.toSeq) shouldBe direct.collect().map(_.toSeq)
  }

  test("diff against the STORED artifact equals the in-session q153 " +
      "diff row-for-row") {
    val docs = Tables.documents(spark, dir)
    // "Yesterday's corpus": the same reproducible subset q153 uses.
    val stored = docs.filter((col("doc_id") % 10L) =!= 0L)
    val out = Files.createTempDirectory("manifest_diff_").toString + "/m"
    ManifestWriter.write(stored, out)

    val fromArtifact = ManifestWriter.diffAgainstStored(docs, out)
      .collect().map(_.toSeq)
    val inSession = SparkEntry.queries("q153_manifest_diff")(spark, dir)
      .collect().map(_.toSeq)
    fromArtifact shouldBe inSession
    // The fixture must actually exercise a non-trivial diff (at
    // sf0.001 the every-tenth-doc arrivals produce "new" sources —
    // tiny sources whose ids all hit % 10 == 0 — beside "unchanged").
    inSession.map(_(1)).distinct.length should be >= 2
  }
}
