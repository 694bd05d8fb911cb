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
}
