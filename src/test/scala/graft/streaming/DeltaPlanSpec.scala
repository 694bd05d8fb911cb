package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{ManifestWriter, SparkSpec}
import graft.operators.TextAnalysis

/** PLAN pin for the snapshot-delta monitor's per-batch join — the
  * round-9 bug this guards against: a broadcast hint on the PRESERVED
  * side of a left-outer join is silently dropped by Spark, and the
  * corpus-row-sized ledger re-plans as a full sort-merge every
  * micro-batch while the scaladoc still claims "ledger never
  * shuffles". The inner-join rewrite makes the hint honorable; these
  * tests go red if anyone reverts. Auto-broadcast is disabled so the
  * ONLY broadcast in the plan is the explicit hint — at fixture size
  * Spark would otherwise mask a dropped hint by auto-broadcasting the
  * tiny ledger side. */
class DeltaPlanSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Parquet-backed stored ledger + a live micro-batch frame, so the
    * ledger side is a real file scan the plan assertions can count. */
  private def fixtures(): (DataFrame, DataFrame, String) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("delta_plan_").toString + "/ledger"
    ManifestWriter.writeLedger(
      Seq((1L, "alpha text", "en", "sA", 10L),
        (2L, "beta text OLD", "en", "sA", 13L),
        (9L, "long gone", "en", "sB", 9L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val stored = ManifestWriter.read(spark, dir)
      .select(col("doc_id"), col("fp").as("s_fp"),
        col("n_chars").as("s_chars"))
    val live = TextAnalysis.docLedgerOf(
      Seq((1L, "alpha text", "en", "sA", 10L),
        (2L, "beta text", "en", "sA", 9L),
        (3L, "gamma text", "en", "sB", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .withColumnRenamed("fp", "c_fp")
      .withColumnRenamed("n_chars", "c_chars")
    (live, stored, dir)
  }

  private def withNoAutoBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("matched plan: inner-join broadcast hint honored — BuildLeft " +
      "BroadcastHashJoin, no sort-merge, exactly one ledger scan") {
    withNoAutoBroadcast {
      val (live, stored, dir) = fixtures()
      val matched = DeltaStreams.matchedOf(live, stored)
      matched.count() shouldBe 2L // docs 1 and 2 are known
      val plan = matched.queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
      plan should include("BuildLeft") // the micro-batch side builds
      (plan should not).include("SortMergeJoin")
      count(plan, dir) shouldBe 1 // the ledger file scan appears once
    }
  }

  test("report plan: both legs read `matched` from the cache — the " +
      "ledger file scan never reappears downstream") {
    withNoAutoBroadcast {
      val (live, stored, dir) = fixtures()
      val matched = DeltaStreams.matchedOf(live, stored).persist()
      try {
        val report = DeltaStreams.reportOver(live, matched)
        report.count() shouldBe 3L
        val plan = report.queryExecution.executedPlan.toString
        // Both the known-leg read and the added-leg's anti-join probe
        // hit the cache (the printout of a cached relation includes the
        // file scan it was materialized FROM, so path-counting would
        // overcount — the pin is the two InMemoryTableScans).
        count(plan, "InMemoryTableScan") shouldBe 2
      } finally matched.unpersist(blocking = false)
    }
  }

  test("batchReport hands back a MATERIALIZED local frame: no file or " +
      "cache scan survives into the caller's plan") {
    withNoAutoBroadcast {
      val (live, stored, dir) = fixtures()
      val report = DeltaStreams.batchReport(live, stored)
      val plan = report.queryExecution.executedPlan.toString
      plan should include("LocalTableScan")
      count(plan, dir) shouldBe 0
      report.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap shouldBe Map(
        ("sA", "unchanged") -> ((1L, 0L)),
        ("sA", "changed") -> ((1L, -4L)),
        ("sB", "added") -> ((1L, 10L)))
    }
  }

  test("null-fingerprint ledger rows classify exactly as the batch " +
      "ledgerDelta: `added`, d_chars = c_chars - coalesce(s_chars, 0)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delta_plan_null_").toString + "/ledger"
    // A stored row whose text is NULL → md5(NULL) = NULL fingerprint.
    ManifestWriter.writeLedger(
      Seq((4L, null.asInstanceOf[String], "en", "sA", 7L),
        (5L, "keep me", "en", "sA", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val liveDocs = Seq((4L, "new hi", "en", "sA", 6L),
      (5L, "keep me", "en", "sA", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val live = TextAnalysis.docLedgerOf(liveDocs)
      .withColumnRenamed("fp", "c_fp")
      .withColumnRenamed("n_chars", "c_chars")
    val stored = ManifestWriter.read(spark, dir)
      .select(col("doc_id"), col("fp").as("s_fp"),
        col("n_chars").as("s_chars"))

    val stream = DeltaStreams.batchReport(live, stored).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val batch = ManifestWriter.deltaAgainstStoredLedger(liveDocs, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    stream shouldBe Map(
      ("sA", "added") -> ((1L, -1L)), // 6 − 7: batch's coalesce arithmetic
      ("sA", "unchanged") -> ((1L, 0L)))
    batch.view.filterKeys(_._2 != "removed").toMap shouldBe stream
  }

  test("a LIVE row with null text (c_fp null) classifies `removed`, " +
      "exactly as the batch classifier's branch order does") {
    import spark.implicits._
    val dir = Files.createTempDirectory("delta_plan_cnull_").toString + "/ledger"
    ManifestWriter.writeLedger(
      Seq((6L, "i was here", "en", "sA", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    // the live redelivery carries NULL text (and so a null n_chars)
    val liveDocs = Seq((6L, null.asInstanceOf[String], "en", "sA",
      null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val live = TextAnalysis.docLedgerOf(liveDocs)
      .withColumnRenamed("fp", "c_fp")
      .withColumnRenamed("n_chars", "c_chars")
    val stored = ManifestWriter.read(spark, dir)
      .select(col("doc_id"), col("fp").as("s_fp"),
        col("n_chars").as("s_chars"))

    val stream = DeltaStreams.batchReport(live, stored).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val batch = ManifestWriter.deltaAgainstStoredLedger(liveDocs, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    stream shouldBe Map(("sA", "removed") -> ((1L, -10L)))
    batch shouldBe stream
  }
}
