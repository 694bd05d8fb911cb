package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `Curate --reconcile`: the production trigger for q159's `removed`
  * class. Release A ships with `--with-ledger`; release B (a drifted
  * feed: some docs gone, some edited) reconciles against A's ledger,
  * and the shipped `report_reconcile` must equal an INDEPENDENT pure-
  * Scala classification of the two shipped corpora read back from
  * disk — including the `removed` rows a stream can never emit. */
class ReconcileCurateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Collect a shipped corpus to (doc_id → (source, fp, n_chars)). */
  private def ledgerOf(corpusDir: String): Map[Long, (String, String, Long)] =
    spark.read.parquet(corpusDir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), md5hex(r.getString(2)), r.getLong(3))))
      .toMap

  test("reconcile report == independent replay of shipped-A vs " +
      "shipped-B, with a non-empty removed class") {
    val root = Files.createTempDirectory("curate_rec_").toString
    val outA = s"$root/releaseA"
    Curate.run(spark, SparkSpec.Sf0001, outA, withLedger = true)

    // Release B's feed: every 11th doc vanished upstream, every 13th
    // was edited in place (stable id, new bytes).
    val fixB = s"$root/feedB"
    val docsB = Tables.documents(spark, SparkSpec.Sf0001)
      .filter(col("doc_id") % 11L =!= 0L)
      .withColumn("text",
        when(col("doc_id") % 13L === 0L, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .withColumn("n_chars",
        when(col("doc_id") % 13L === 0L, col("n_chars") + 3L)
          .otherwise(col("n_chars")))
    docsB.write.parquet(s"$fixB/documents.parquet")
    Tables.embeddings(spark, SparkSpec.Sf0001)
      .write.parquet(s"$fixB/embeddings.parquet")

    val outB = s"$root/releaseB"
    Curate.run(spark, fixB, outB,
      reconcileLedger = Some(s"$outA/ledger"))

    val got = spark.read.json(s"$outB/report_reconcile")
      .select(col("source"), col("status"), col("n_docs"),
        col("delta_chars"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    // Independent replay from the shipped bytes themselves.
    val a = ledgerOf(s"$outA/corpus")
    val b = ledgerOf(s"$outB/corpus")
    val expected = (a.keySet ++ b.keySet).toSeq
      .map { id =>
        (a.get(id), b.get(id)) match {
          case (None, Some((src, _, nc)))       => (src, "added", nc)
          case (Some((src, _, nc)), None)       => (src, "removed", -nc)
          case (Some((src, fpA, ncA)), Some((_, fpB, ncB))) =>
            if (fpA == fpB) (src, "unchanged", 0L)
            else (src, "changed", ncB - ncA)
          case (None, None) => fail("impossible")
        }
      }
      .groupBy(t => (t._1, t._2))
      .map { case (k, ts) => k -> ((ts.size.toLong, ts.map(_._3).sum)) }

    got shouldBe expected
    // the class this flag exists for: upstream-vanished docs that
    // shipped in release A
    expected.keys.map(_._2) should contain("removed")
    expected.keys.map(_._2) should contain("changed")
    // every edited doc that shipped both times carries its +3 chars
    val changedDelta = expected.collect {
      case ((_, "changed"), (n, d)) => (n, d) }.toSeq
    all(changedDelta.map { case (n, d) => d - 3 * n }) shouldBe 0L
  }
}
