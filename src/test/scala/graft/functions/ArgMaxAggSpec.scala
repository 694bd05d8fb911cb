package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `graft_argmax` — the hash-aggregable argmax that replaced q44's
  * row_number window (and the SortAggregate-demoted min-over-struct).
  * Exercises the full TypedImperativeAggregate lifecycle: partial
  * update, serialize/deserialize across the shuffle, merge, null
  * handling, and plan shape (ObjectHashAggregate, no sort).
  */
class ArgMaxAggSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ensureRegistered(): Unit =
    graft.plans.GraftExtensions.register(spark)

  test("argmax over many partitions equals the window argmax (merge + " +
      "serde path exercised)") {
    ensureRegistered()
    import spark.implicits._
    // 200 groups × 37 candidates, scattered over 16 partitions so map-side
    // partials MUST serialize, shuffle, and merge. ord is unique per
    // group (score, -cand) — deterministic winner.
    val rows = for (g <- 0 until 200; c <- 0 until 37)
      yield (g.toLong, c.toLong, ((g * 31 + c * 17) % 97).toDouble,
        Array.fill(8)((g * c).toLong)) // array payload: the SortAggregate trap
    val df = rows.toDF("g", "cand", "score", "payload").repartition(16)

    val got = df.groupBy(col("g"))
      .agg(ArgMaxAgg.argMax(
        struct(col("score"), negate(col("cand"))),
        struct(col("cand"), col("payload"))).as("b"))
      .select(col("g"), col("b.cand").as("cand"), col("b.payload").as("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // Reference: plain Scala argmax with the same (score desc, cand asc).
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.maxBy { case (_, c, s, _) => (s, -c) }._2
    }
    got shouldBe expected
  }

  test("null ordering keys are ignored; an all-null group yields null") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "a"), (1L, None, "poison"), (1L, Some(7.0), "b"),
      (2L, None, "x"), (2L, None, "y"))
      .toDF("g", "score", "v").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(ArgMaxAgg.argMax(col("score"), col("v")).as("best"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    got shouldBe Map(1L -> Some("b"), 2L -> None)
  }

  test("plans as ObjectHashAggregate — no SortAggregate, no sort before " +
      "the aggregate") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq((1L, 1.0, Array(1L)), (1L, 2.0, Array(2L)))
      .toDF("g", "score", "payload")
    val plan = df.groupBy(col("g"))
      .agg(ArgMaxAgg.argMax(col("score"), struct(col("payload"))).as("b"))
      .queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    plan should not include "SortAggregate"
  }

  test("argmin: reversed ordering, works on non-negatable key types " +
      "(timestamps) — the q23 first-event shape") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-02 00:00:00"), 20L),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 10L),
      (2L, java.sql.Timestamp.valueOf("2026-03-01 00:00:00"), 30L))
      .toDF("g", "ts", "event_id").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(ArgMaxAgg.argMin(struct(col("ts"), col("event_id")),
        col("event_id")).as("first"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 10L, 2L -> 30L)
  }

  test("non-orderable ordering key (map) is rejected at analysis, not " +
      "at runtime") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1), "v")).toDF("g", "m", "v")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      df.groupBy(col("g")).agg(ArgMaxAgg.argMax(col("m"), col("v"))).collect()
  }

  test("SQL surface: graft_argmax callable from spark.sql") {
    ensureRegistered()
    import spark.implicits._
    Seq((1L, 1.0, "lo"), (1L, 9.0, "hi")).toDF("g", "s", "v")
      .createOrReplaceTempView("argmax_t")
    spark.sql("SELECT graft_argmax(s, v) AS best FROM argmax_t GROUP BY g")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("hi")
  }
}
