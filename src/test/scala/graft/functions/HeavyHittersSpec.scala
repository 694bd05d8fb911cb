package graft.functions

import org.apache.spark.sql.functions.{col, count, explode, lit}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Misra–Gries guarantee tests in the regime the synthetic corpus can't
  * reach: vocabulary ≫ k, so the sketch MUST evict (at most k−1
  * counters) yet every item above the n/k frequency bound survives —
  * under real partial aggregation and merges, across arbitrary
  * repartitionings.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Planted stream: 3 heavy items well above n/k, plus a long uniform
    * tail of rare items (vocab 1000 ≫ k = 64). Deterministic
    * construction, ids interleaved so heavies aren't adjacent. */
  private def plantedTokens: Seq[(String, String)] = {
    val heavy = Seq.tabulate(600)(i => s"hot${i % 3}")      // 200 each
    val tail = Seq.tabulate(2400)(i => s"cold${i % 1000}")  // ≤ 3 each
    // deterministic interleave: no Random (order must not be special)
    val mixed = (heavy ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 3000 }.map(_._1)
    mixed.map(("s1", _))
  }

  test("guarantee: every item with frequency > n/k is among the " +
      "candidates, and at most k-1 candidates come back") {
    import spark.implicits._
    graft.functions.VectorExprs.ensureRegistered(spark)
    val k = 64
    val df = plantedTokens.toDF("source", "w").repartition(16)
    val cand = df.groupBy(col("source"))
      .agg(HeavyHitters.heavyHitters(col("w"), k).as("cand"),
        count(lit(1)).as("n"))
      .select(col("cand"), col("n")).head()
    val items = cand.getSeq[String](0)
    val n = cand.getLong(1)
    items.length should be <= (k - 1)
    // each hot item: 200 occurrences; n/k = 3000/64 ≈ 46.9 < 200
    (200L * k) should be > n // fixture sanity: hots are above the bound
    items should contain allOf ("hot0", "hot1", "hot2")
  }

  test("two-pass exact heavy hitters are repartition-invariant (the " +
      "q99 shape): same phi-set under different partitionings") {
    import spark.implicits._
    graft.functions.VectorExprs.ensureRegistered(spark)
    val k = 64
    def phiSet(parts: Int): Set[(String, Long)] = {
      val toks = plantedTokens.toDF("source", "w").repartition(parts)
      val cand = toks.groupBy(col("source"))
        .agg(HeavyHitters.heavyHitters(col("w"), k).as("cand"),
          count(lit(1)).as("n_tokens"))
        .select(col("source"), col("n_tokens"),
          explode(col("cand")).as("w"))
      toks.join(cand, Seq("source", "w"))
        .groupBy(col("source"), col("w"), col("n_tokens"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 20L > col("n_tokens"))
        .select(col("w"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val a = phiSet(1)
    val b = phiSet(7)
    val c = phiSet(32)
    a shouldBe Set(("hot0", 200L), ("hot1", 200L), ("hot2", 200L))
    b shouldBe a
    c shouldBe a
  }

  test("merge keeps the composed error bound: a candidate absent from " +
      "the sketch implies true frequency <= n/k (contrapositive check " +
      "over the WHOLE vocabulary)") {
    import spark.implicits._
    graft.functions.VectorExprs.ensureRegistered(spark)
    val k = 64
    val toks = plantedTokens.toDF("source", "w").repartition(13)
    val cand = toks.groupBy(col("source"))
      .agg(HeavyHitters.heavyHitters(col("w"), k).as("cand"))
      .select(explode(col("cand")).as("w"))
      .collect().map(_.getString(0)).toSet
    val exact = plantedTokens.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = plantedTokens.size
    exact.foreach { case (w, c) =>
      if (c > n.toLong / k) withClue(s"$w ($c occurrences) missing:") {
        cand should contain(w)
      }
    }
  }

  test("SQL surface: graft_heavy_hitters is callable from spark.sql " +
      "and rejects a non-literal k") {
    graft.functions.VectorExprs.ensureRegistered(spark)
    import spark.implicits._
    plantedTokens.toDF("source", "w").createOrReplaceTempView("hh_toks")
    val items = spark.sql(
      "SELECT graft_heavy_hitters(w, 64) FROM hh_toks GROUP BY source")
      .head().getSeq[String](0)
    items should contain allOf ("hot0", "hot1", "hot2")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(w, length(w)) FROM hh_toks").collect()
    }
    err.getMessage should include("literal")
  }
}
