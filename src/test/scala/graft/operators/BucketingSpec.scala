package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Bucketing: the co-located-join technique for repeated fact-fact joins
  * at scale. Writing both sides bucketed by the join key lets the join
  * read pre-partitioned data — the plan contains NO shuffle exchange on
  * the bucketed sides, which at 100 TB is the difference between a
  * network-bound and a scan-bound join. */
class BucketingSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("bucketed fact tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("warehouse_")
    // Disable broadcast so the join strategy decision is about
    // partitioning, not table size.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, SparkSpec.Sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", wh.resolve("li").toString)
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, SparkSpec.Sf0001)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", wh.resolve("or").toString)
        .mode("overwrite").saveAsTable("or_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("or_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      // And the join is still correct.
      val n = joined.count()
      val expected = Tables.lineitem(spark, SparkSpec.Sf0001)
        .join(Tables.orders(spark, SparkSpec.Sf0001),
          col("l_orderkey") === col("o_orderkey")).count()
      n shouldBe expected
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("the cross-modal vec_id<->doc_id join is exchange-free under id " +
      "bucketing — the co-location q97/q114/q126 scaladocs claim") {
    val wh = Files.createTempDirectory("warehouse_xm_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.documents(spark, SparkSpec.Sf0001)
        .select(col("doc_id"), col("source"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", wh.resolve("docs").toString)
        .mode("overwrite").saveAsTable("docs_bucketed")
      Tables.embeddings(spark, SparkSpec.Sf0001)
        .select(col("vec_id"), col("label"))
        .write.bucketBy(8, "vec_id").sortBy("vec_id")
        .option("path", wh.resolve("vecs").toString)
        .mode("overwrite").saveAsTable("vecs_bucketed")

      val joined = spark.table("vecs_bucketed")
        .join(spark.table("docs_bucketed"),
          col("vec_id") === col("doc_id"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"

      val n = joined.count()
      val expected = Tables.embeddings(spark, SparkSpec.Sf0001)
        .join(Tables.documents(spark, SparkSpec.Sf0001),
          col("vec_id") === col("doc_id")).count()
      n shouldBe expected
    } finally {
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS vecs_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
