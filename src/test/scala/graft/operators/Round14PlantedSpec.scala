package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture semantics pins for the round-14 additions — each
  * test hand-builds the one geometry its query exists to distinguish,
  * so the discriminating rule is pinned independently of the synthetic
  * testdata the oracle runs on. */
class Round14PlantedSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------- q233
  test("q233: ONLY the sole late supplier of a multi-supplier order " +
      "is blamed — dual-late orders, single-supplier orders, and " +
      "on-time orders all excluded") {
    import spark.implicits._
    val dir = tmp("waiting_")
    val day0 = Timestamp.valueOf("1997-01-01 00:00:00")
    def ship(daysLate: Int) = // late ⇔ shipped > orderdate + 75 days
      new Timestamp(day0.getTime + (75L + daysLate) * 86400000L)
    // order 1: suppliers 10 (late) + 11 (on time)  → supplier 10 blamed
    // order 2: suppliers 10 + 11 both late          → excluded
    // order 3: supplier 12 alone, late              → excluded (n_supp=1)
    // order 4: suppliers 10 + 12, both on time      → excluded
    Seq(
      (1L, 10L, ship(+1)), (1L, 11L, ship(-1)),
      (2L, 10L, ship(+5)), (2L, 11L, ship(+5)),
      (3L, 12L, ship(+9)),
      (4L, 10L, ship(-9)), (4L, 12L, ship(-9)))
      .map { case (ok, sk, sd) =>
        (ok, 1L, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", sd)
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L, "O", 1.0, day0, "1-URGENT"),
      (2L, 1L, "O", 1.0, day0, "1-URGENT"),
      (3L, 1L, "O", 1.0, day0, "1-URGENT"),
      (4L, 1L, "O", 1.0, day0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "Supp#10", 0), (11L, "Supp#11", 0), (12L, "Supp#12", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0, "ALPHA", 0), (1, "BETA", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    val rows = SparkEntry.queries("q233_waiting_suppliers")(spark, dir)
      .collect()
    rows.length shouldBe 1
    rows.head.getLong(0) shouldBe 10L // s_suppkey
    rows.head.getLong(3) shouldBe 1L  // exactly order 1
  }

  // ---------------------------------------------------------- q235
  test("q235: overlapping sessions stack (+1/-1 sweep), a session is " +
      "open THROUGH its last event's second, and days report " +
      "independently") {
    import spark.implicits._
    val dir = tmp("conc_")
    val day1 = 1704067200L // 2024-01-01 00:00:00 UTC, whole day
    val day2 = day1 + 86400L
    def ev(id: Long, user: Long, s: Long) =
      (id, new Timestamp(s * 1000L), user, "view", 0.0, "{}")
    // day 1: u1 spans [0, 100]; u2 spans [100, 200] — u2 starts the
    // SECOND u1's last event lands, and inclusive-end means both are
    // open at that second → peak 2. u3 spans [4000, 4100], disjoint.
    // day 2: one lone session → peak 1.
    Seq(
      ev(1, 1, day1), ev(2, 1, day1 + 100),
      ev(3, 2, day1 + 100), ev(4, 2, day1 + 200),
      ev(5, 3, day1 + 4000), ev(6, 3, day1 + 4100),
      ev(7, 4, day2 + 50))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q235_peak_concurrency")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    got(day1 / 86400) shouldBe ((2L, 3L)) // peak 2, 3 session starts
    got(day2 / 86400) shouldBe ((1L, 1L))
    Features.clear(spark)
  }

  // ---------------------------------------------------------- q236
  test("q236: uniform activity reads Gini 0; one dominant user reads " +
      "the hand-computed Gini and top-decile share exactly") {
    import spark.implicits._
    val dir = tmp("gini_")
    val t0 = 1704067200L
    var id = 0L
    def evs(user: Long, tpe: String, n: Int) = (1 to n).map { i =>
      id += 1
      (id, new Timestamp((t0 + id) * 1000L), user, tpe, 0.0, "{}")
    }
    // 'uniform': users 1-4, 5 events each → Gini 0, top decile (1
    // user) holds 5/20 = 250000 micro.
    // 'skewed': counts 1,1,1,97 → Σi·x = 1+2+3+388 = 394;
    // gini_u = 1e6·(2·394 − 5·100)/(4·100) = 720000; top decile holds
    // 97/100 = 970000 micro.
    val rows = (1L to 4L).flatMap(u => evs(u, "uniform", 5)) ++
      evs(11L, "skewed", 1) ++ evs(12L, "skewed", 1) ++
      evs(13L, "skewed", 1) ++ evs(14L, "skewed", 97)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q236_user_gini")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got("uniform") shouldBe ((4L, 20L, 0L, 250000L))
    got("skewed") shouldBe ((4L, 100L, 720000L, 970000L))
  }

  // ---------------------------------------------------------- q237
  test("q237: same head + different bodies forms a family; identical " +
      "bodies (q34's business) and short docs do not") {
    import spark.implicits._
    val dir = tmp("prefix_")
    val head = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      // template family: same 8-token head, 3 distinct bodies
      (1L, s"$head tail one"), (2L, s"$head tail two"),
      (3L, s"$head tail three"),
      // exact duplicates: same head AND same body → n_bodies = 1, excluded
      (4L, "same same same same same same same same body"),
      (5L, "same same same same same same same same body"),
      // short doc: 3 tokens, never enters
      (6L, "too short doc"))
    docs.map { case (i, t) => (i, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q237_prefix_families")(spark, dir)
      .collect()
    rows.length shouldBe 1
    rows.head.getLong(1) shouldBe 3L // n_docs
    rows.head.getLong(2) shouldBe 3L // n_bodies
    rows.head.getLong(4) shouldBe 1L // example_doc = min id
  }

  // ---------------------------------------------------------- q238/q240
  test("q238/q240: a planted zero vector and norm outlier are counted; " +
      "sign-separable labels read homophily 10⁶ against their chance " +
      "share") {
    import spark.implicits._
    val dir = tmp("embq_")
    // label 0: 8 healthy vectors, all-positive signs, norms ~equal;
    //          plus one ZERO vector and one 10x-norm outlier.
    // label 1: 8 healthy vectors, all-negative signs (different
    //          sign-LSH bucket → kNN stays intra-label).
    def vec(scale: Float): Array[Float] = Array.fill(64)(scale)
    val rows =
      (0 until 8).map(i => (i.toLong, vec(1.0f + i * 0.01f), 0)) ++
        Seq((8L, vec(0.0f), 0), (9L, vec(10.0f), 0)) ++
        (10 until 18).map(i => (i.toLong, vec(-(1.0f + i * 0.01f)), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val quality = SparkEntry.queries("q238_embedding_quality")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(7)))).toMap
    // label 0: 10 vectors, 1 zero, min_n2 0, the 10x vector counted high
    quality(0)._1 shouldBe 10L
    quality(0)._2 shouldBe 1L
    quality(0)._3 shouldBe 0L
    quality(0)._4 should be >= 1L // n_norm_high catches the outlier
    quality(1) shouldBe ((8L, 0L, quality(1)._3, 0L))

    val hom = SparkEntry.queries("q240_knn_homophily")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // every in-bucket neighbor shares the query's label
    hom(1)._1 shouldBe 1000000L
    // chance = label share of the corpus (8/18 and 10/18)
    hom(1)._2 shouldBe (1000000L * 8 / 18)
    hom(0)._2 shouldBe (1000000L * 10 / 18)
    Features.clear(spark)
  }
}
