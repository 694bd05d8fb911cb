package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `graft_topk` — the rank-pruned per-key top-k aggregate that replaces
  * the row_number-window form (q07 vs q134). Exercises the full
  * TypedImperativeAggregate lifecycle: bounded-heap update, serialize/
  * deserialize across the shuffle, merge of partial heaps, null
  * handling, under/exact/over-full groups, and plan shape
  * (ObjectHashAggregate, no sort of the input).
  */
class TopKAggSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ensureRegistered(): Unit =
    graft.plans.GraftExtensions.register(spark)

  test("topk over many partitions equals the window top-k (merge + serde " +
      "path exercised; groups under, at, and over k)") {
    ensureRegistered()
    import spark.implicits._
    // Group g has g+1 candidates (g = 0..59): groups below k, exactly k,
    // and far above k. Scattered over 16 partitions so map-side partial
    // heaps MUST serialize, shuffle, and merge. ord unique per group.
    val k = 5
    val rows = for (g <- 0 until 60; c <- 0 to g)
      yield (g.toLong, c.toLong, ((g * 31 + c * 17) % 101).toDouble)
    val df = rows.toDF("g", "c", "score").repartition(16)

    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(
        struct(col("score"), negate(col("c"))),
        struct(col("c"), col("score")), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "row")))
      .select(col("g"), col("pos"), col("row.c").as("c"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, c, s) => (-s, c) }.take(k).zipWithIndex
        .map { case ((_, c, _), i) => (g, i) -> c }
    }
    got shouldBe expected
    // Size law: every group keeps min(groupSize, k) rows.
    got.keysIterator.toSeq.groupBy(_._1).foreach { case (g, ks) =>
      ks.size shouldBe math.min(g + 1, k)
    }
  }

  test("null ordering keys are ignored; an all-null group yields an " +
      "empty array") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "a"), (1L, None, "poison"), (1L, Some(7.0), "b"),
      (2L, None, "x"), (2L, None, "y"))
      .toDF("g", "score", "v").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("score"), col("v"), 2).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    got shouldBe Map(1L -> List("b", "a"), 2L -> Nil)
  }

  test("result is invariant to input partitioning (1 / 8 / 32 partitions)") {
    ensureRegistered()
    import spark.implicits._
    val rows = for (g <- 0 until 20; c <- 0 until 40)
      yield (g.toLong, c.toLong, ((g * 13 + c * 7) % 83).toDouble)
    def run(parts: Int): Map[Long, Seq[Long]] =
      rows.toDF("g", "c", "score").repartition(parts)
        .groupBy(col("g"))
        .agg(TopKAgg.topK(struct(col("score"), negate(col("c"))),
          col("c"), 3).as("top"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val p1 = run(1)
    run(8) shouldBe p1
    run(32) shouldBe p1
  }

  test("plans as ObjectHashAggregate — no SortAggregate, no sort of the " +
      "input before the aggregate") {
    ensureRegistered()
    import spark.implicits._
    val df = Seq((1L, 2L, 3.0)).toDF("g", "c", "score")
    val plan = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("score"), negate(col("c"))),
        struct(col("c"), col("score")), 3).as("top"))
      .queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    plan should not include "SortAggregate"
  }

  test("q134 (aggregate) returns exactly q07's (window) rows") {
    ensureRegistered()
    val a = graft.SparkEntry.queries("q134_topk_agg")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSet
    val w = graft.SparkEntry.queries("q07_window_topk")(spark, SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSet
    a shouldBe w
    a should not be empty
  }

  test("q134's plan never sorts the orders input: the only Sort is the " +
      "final report ordering, ABOVE the aggregate") {
    ensureRegistered()
    // Pristine build (memo off): the plan memo shares ONE DataFrame per
    // (session, dir, query), and the row-parity test above has already
    // EXECUTED it — an executed AdaptiveSparkPlanExec stringifies with
    // both Final and Initial plan sections, so line-order assertions on
    // the shared frame would read the wrong tree. The pinned property
    // is about the built plan, so build one fresh.
    spark.conf.set("spark.graft.features.cache", "off")
    val df =
      try graft.SparkEntry.queries("q134_topk_agg")(spark, SparkSpec.Sf0001)
      finally spark.conf.unset("spark.graft.features.cache")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    plan should not include "SortAggregate"
    plan should not include "Window"
    // The window form sorts below its Window operator; here the single
    // Sort is the output orderBy and the aggregate sits under it with no
    // Sort between itself and the scan.
    val lines = plan.linesIterator.toVector
    val firstAgg = lines.indexWhere(_.contains("ObjectHashAggregate"))
    firstAgg should be >= 0
    lines.drop(firstAgg).exists(_.trim.matches("^[+:|\\- *()0-9]*Sort .*")) shouldBe false
  }
}
