package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `Curate --with-buckets` must SHIP the co-location layout
  * BucketingSpec proved on a fixture: documents + embeddings bucketed
  * by id with a REGISTER.sql whose DDL, executed by a consumer, yields
  * an exchange-free cross-modal id join over exactly the curated rows.
  * The round-trip here is the consumer's: run the CLI, execute the
  * shipped DDL verbatim, join, read the plan. */
class CurateBucketsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sfDir = SparkSpec.Sf0001

  test("the shipped bucketed corpus joins exchange-free after running " +
      "REGISTER.sql, and carries exactly the curated rows") {
    val out = Files.createTempDirectory("curate_bk_").toString + "/job"
    Curate.run(spark, sfDir, out, withBuckets = true)

    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/corpus_bucketed/REGISTER.sql")), "UTF-8")
    ddl should include("CLUSTERED BY (doc_id)")
    ddl should include("CLUSTERED BY (vec_id)")
    ddl should include(s"INTO ${Curate.CurateBuckets} BUCKETS")

    spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_embeddings_bucketed")
    // Restore whatever threshold the shared session was running with,
    // not a hardcoded default — a later spec must not inherit this
    // test's broadcast-off override.
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ddl.split(";").map(_.trim).filter(_.nonEmpty).foreach(spark.sql(_))

      val joined = spark.table("graft_embeddings_bucketed")
        .join(spark.table("graft_docs_bucketed"),
          col("vec_id") === col("doc_id"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      // Row parity against the plain shipped corpus (same curation) —
      // the bucketed layout is a re-LAYOUT, never a re-selection.
      val shippedDocs = spark.read.parquet(s"$out/corpus")
      val expected = Tables.embeddings(spark, sfDir)
        .join(shippedDocs, col("vec_id") === col("doc_id")).count()
      joined.count() shouldBe expected
      expected should be > 0L
      spark.table("graft_docs_bucketed").count() shouldBe shippedDocs.count()
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_embeddings_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
    }
  }
}
