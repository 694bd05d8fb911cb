package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-geometry pins for the round-14 relational additions: each
  * test hand-builds the boundary its query must discriminate (the
  * oracle pins full-corpus values; these pin the RULE). */
class Round14RelationalSpec extends AnyFunSuite with SparkSpec
    with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q241: the 90/91-day and 365/366-day bucket edges cut exactly, " +
      "against the corpus' own latest OPEN-order date; non-open " +
      "orders are invisible") {
    import spark.implicits._
    val dir = tmp("aging_")
    // as-of anchor = latest OPEN order: 2000-01-01. Ages: 0, 90, 91,
    // 365, 366, 731 days; one 'F' order newer than the anchor must
    // neither shift the anchor nor appear.
    Seq(
      (1L, 1L, "O", 10.0, ts("2000-01-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 10.0, ts("1999-10-03 00:00:00"), "1-URGENT"), // 90d
      (3L, 1L, "O", 10.0, ts("1999-10-02 00:00:00"), "1-URGENT"), // 91d
      (4L, 1L, "O", 10.0, ts("1999-01-01 00:00:00"), "1-URGENT"), // 365d
      (5L, 1L, "O", 10.0, ts("1998-12-31 00:00:00"), "1-URGENT"), // 366d
      (6L, 1L, "O", 10.0, ts("1997-12-31 00:00:00"), "1-URGENT"), // 731d
      (7L, 1L, "F", 99.0, ts("2001-06-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q241_order_aging")(spark, dir)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    got shouldBe Map("a_0_90d" -> 2L, "b_91_365d" -> 2L,
      "c_1_2y" -> 1L, "d_over_2y" -> 1L)
  }

  test("q242: the first year's share delta is NULL, later deltas are " +
      "exact micro differences, and shares within a year sum to ~10⁶") {
    import spark.implicits._
    val dir = tmp("drift_")
    // 1997: A=75, B=25 of 100; 1998: A=50, B=50 of 100.
    Seq(
      (1L, 1L, "F", 75.0, ts("1997-03-01 00:00:00"), "1-URGENT"),
      (2L, 2L, "F", 25.0, ts("1997-06-01 00:00:00"), "1-URGENT"),
      (3L, 1L, "F", 50.0, ts("1998-03-01 00:00:00"), "1-URGENT"),
      (4L, 2L, "F", 50.0, ts("1998-06-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "CustA", 0, 0.0, "AUTO"), (2L, "CustB", 1, 0.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0, "ALPHA", 0), (1, "BETA", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val rows = SparkEntry.queries("q242_share_drift")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
    rows((1997L, "ALPHA")) shouldBe ((750000L, None))
    rows((1997L, "BETA")) shouldBe ((250000L, None))
    rows((1998L, "ALPHA")) shouldBe ((500000L, Some(-250000L)))
    rows((1998L, "BETA")) shouldBe ((500000L, Some(250000L)))
  }

  test("q246: a pair buying twice counts as repeat, two DIFFERENT " +
      "customers of one part do not, nor does one customer buying " +
      "two parts of a brand once each") {
    import spark.implicits._
    val dir = tmp("reorder_")
    def line(ok: Long, pk: Long) =
      (ok, pk, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        ts("1997-01-01 00:00:00"))
    // BrandR: cust 1 buys part 10 in two different orders → repeat.
    // BrandS: custs 1 and 2 each buy part 20 once → two one-shot pairs.
    // BrandT: cust 1 buys parts 30 and 31 once each → two one-shot pairs.
    Seq(line(1L, 10L), line(2L, 10L), // cust 1 orders 1,2
      line(1L, 20L), line(3L, 20L),   // cust 1 order 1; cust 2 order 3
      line(1L, 30L), line(2L, 31L))   // cust 1 orders 1,2
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L)).map { case (ok, ck) =>
      (ok, ck, "O", 1.0, ts("1997-01-01 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "p10", "BrandR", "t", 1, 1.0),
      (20L, "p20", "BrandS", "t", 1, 1.0),
      (30L, "p30", "BrandT", "t", 1, 1.0),
      (31L, "p31", "BrandT", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q246_reorder_rate")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    got("BrandR") shouldBe ((1L, 1L))
    got("BrandS") shouldBe ((2L, 0L))
    got("BrandT") shouldBe ((2L, 0L))
  }

  test("q245: gap quantiles cut on the exact day gaps; one-order " +
      "customers count in the rate denominator but contribute no gap") {
    import spark.implicits._
    val dir = tmp("repeat_")
    // cust 1: 11 orders — 5 gaps of 10 days then 5 gaps of 100 days
    // (p50 lands in the 10s, p90 in the 100s under the suite's
    // nearest-rank cut target = 1 + ((n−1)·p) div 100);
    // cust 2 orders once → no gaps, not a repeat customer.
    val day0 = ts("1997-01-01 00:00:00").getTime
    val orderDays = Seq(0, 10, 20, 30, 40, 50, 150, 250, 350, 450, 550)
    val orders = orderDays.zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, 1L, "O", 1.0,
        new Timestamp(day0 + d.toLong * 86400000L), "1-URGENT")
    } :+ ((99L, 2L, "O", 1.0, ts("1997-03-01 00:00:00"), "1-URGENT"))
    orders
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "c1", 0, 0.0, "SEG"), (2L, "c2", 0, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q245_repeat_interval")(spark, dir)
      .collect().head
    // (segment, n_customers, n_repeat, rate, n_gaps, p50, p90)
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 1L
    r.getLong(3) shouldBe 500000L
    r.getLong(4) shouldBe 10L
    r.getLong(5) shouldBe 10L  // target rank 5 of {10×5, 100×5}
    r.getLong(6) shouldBe 100L // target rank 9
  }
}
