package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** The two-phase order-statistics helpers must be BIT-IDENTICAL to the
  * global windows they replace — that equality is what lets the
  * oracle-pinned queries (q76/q102/q164/q180/q198/q215) swap plans
  * without touching their oracles. Shard sizes here are tiny (7/16
  * rows) so sf0.001's ~600 documents span MANY shards, exercising the
  * offsets cumsum, the broadcast join-back, and (for lag) the
  * shard-seam stitch across empty and non-empty buckets. */
class ShardedPrefixSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val docs = Tables.documents(spark, SparkSpec.Sf0001)
    .select(col("source"), col("doc_id"),
      expr("size(split(text, ' '))").cast("long").as("x"),
      md5(col("text")).as("fp"))
    .persist()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("shardedPrefixSum (exclusive) equals the global per-source " +
      "running sum at shard size 7") {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = docs.withColumn("p", sum(col("x")).over(w) - col("x"))
      .select(col("source"), col("doc_id"), col("p"))
    val got = Features.shardedPrefixSum(docs, Seq("source"),
        expr("doc_id div 7"), Seq(col("doc_id")), col("x"), "p")
      .select(col("source"), col("doc_id"), col("p"))
    rows(got) shouldBe rows(expected)
  }

  test("shardedPrefixSum (inclusive) equals the global running sum") {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = docs.withColumn("p", sum(col("x")).over(w))
      .select(col("source"), col("doc_id"), col("p"))
    val got = Features.shardedPrefixSum(docs, Seq("source"),
        expr("doc_id div 16"), Seq(col("doc_id")), col("x"), "p",
        inclusive = true)
      .select(col("source"), col("doc_id"), col("p"))
    rows(got) shouldBe rows(expected)
  }

  test("shardedRowNumber equals row_number over a VALUE ordering " +
      "(ties bucket together; doc_id breaks them intra-shard)") {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("x"), col("doc_id"))
    val expected = docs
      .withColumn("i", row_number().over(w).cast("long"))
      .select(col("source"), col("doc_id"), col("i"))
    val got = Features.shardedRowNumber(docs, Seq("source"),
        expr("x div 16"), Seq(col("x"), col("doc_id")), "i")
      .select(col("source"), col("doc_id"), col("i"))
    rows(got) shouldBe rows(expected)
  }

  test("shardedLag equals lag(1) including across shard seams and " +
      "EMPTY buckets (doc_id div 7 has gaps per source — sources " +
      "interleave doc_ids, so most of a source's buckets are sparse)") {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val expected = docs
      .withColumn("pf", lag(col("fp"), 1).over(w))
      .select(col("source"), col("doc_id"), col("pf"))
    val got = Features.shardedLag(docs, Seq("source"),
        expr("doc_id div 7"), col("doc_id"), col("fp"), "pf")
      .select(col("source"), col("doc_id"), col("pf"))
    rows(got) shouldBe rows(expected)
  }

  test("shardedLag under a VIOLATED total-order contract (ties at a " +
      "shard's max key) degrades to the documented wrong-but-stable " +
      "stitch: no row duplication, and the tied shard-seam value is " +
      "the deterministic max") {
    import spark.implicits._
    // two shards of bucket width 10; shard 0's max key (9) is TIED
    // twice with values "b" < "c"; shard 1 has one row.
    val df = Seq(
      ("s", 1L, "a"), ("s", 9L, "b"), ("s", 9L, "c"), ("s", 12L, "d"))
      .toDF("source", "k", "v")
    val got = Features.shardedLag(df, Seq("source"),
        expr("k div 10"), col("k"), col("v"), "pv")
      .select(col("k"), col("v"), col("pv"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).sortBy(t => (t._1, t._2))
    // 4 input rows -> exactly 4 output rows (without the edges dedupe
    // the tied shard carries TWO edge rows, duplicating every one of
    // its rows through the final join-back)
    got.length shouldBe 4
    // shard 1's head stitches to max("b", "c") = "c", deterministically
    got.find(_._1 == 12L).get._3 shouldBe Some("c")
  }

  test("the ingest shard-size conf changes the plan's shard split " +
      "but not one output value (q215 at shard size 7 ≡ default)") {
    val s = spark.newSession()
    s.conf.set(Features.CacheModeConf, "off")
    s.conf.set(Features.PrefixShardSizeConf, "7")
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val tiny = graft.SparkEntry
        .queries("q215_vocab_growth")(s, SparkSpec.Sf0001)
        .collect().map(_.toString).sorted.toSeq
      val default = graft.SparkEntry
        .queries("q215_vocab_growth")(spark, SparkSpec.Sf0001)
        .collect().map(_.toString).sorted.toSeq
      tiny shouldBe default
    } finally {
      Features.clear(s)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("the rewritten consumers plan ZERO hazard rank windows and " +
      "ZERO grouped SortAggregates in their default (exact) mode") {
    Seq("q76_context_packing", "q102_packing_audit", "q164_token_gini",
      "q180_crawl_runs", "q198_rank_corr", "q215_vocab_growth").foreach {
      name =>
        val s = spark.newSession()
        s.conf.set(Features.CacheModeConf, "off")
        org.apache.spark.sql.SparkSession.setActiveSession(s)
        try {
          val p = graft.SparkEntry.queries(name)(s, SparkSpec.Sf0001)
            .queryExecution.sparkPlan
          withClue(s"$name hazard windows: ") {
            graft.tools.PlanCensus.hazardWindows(p) shouldBe empty
          }
          val sortAggs = p.collect {
            case n: org.apache.spark.sql.execution.aggregate.SortAggregateExec
                if n.groupingExpressions.nonEmpty => n
          }
          withClue(s"$name grouped SortAggregates: ") {
            sortAggs shouldBe empty
          }
        } finally {
          Features.clear(s)
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
        }
    }
  }
}
