package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The documented exact-rank → approx-quantile swap
  * (`spark.graft.quantiles.mode=approx`) for q106 (per-cluster pruning
  * thresholds) and q109 (surprisal quintile cuts): the approx plans
  * must reproduce the exact decisions in the non-boundary mass, keep
  * totals intact, and unknown modes must reject loudly. Default mode
  * stays exact — the oracle-pinned plans are untouched. */
class QuantileModeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  private def withMode[T](m: String)(body: => T): T =
    try { spark.conf.set(Features.QuantileModeConf, m); body }
    finally spark.conf.unset(Features.QuantileModeConf)

  test("q106 approx: same vectors, same clusters, ≥90% decision " +
      "agreement with the exact rank, and the cap still bites") {
    import spark.implicits._
    val exact = Similarity.queries("q106_cluster_prune")(spark, dir)
      .select("vec_id", "cluster_id", "decision")
      .as[(Long, Long, String)].collect()
    val approx = withMode("approx") {
      Similarity.queries("q106_cluster_prune")(spark, dir)
        .select("vec_id", "cluster_id", "decision")
        .as[(Long, Long, String)].collect()
    }
    val eById = exact.map(r => r._1 -> (r._2, r._3)).toMap
    val aById = approx.map(r => r._1 -> (r._2, r._3)).toMap
    aById.keySet shouldBe eById.keySet
    // assignment is identical (the swap touches only the threshold)
    eById.forall { case (id, (c, _)) => aById(id)._1 == c } shouldBe true
    val agree = eById.count { case (id, (_, d)) => aById(id)._2 == d }
    agree.toDouble / eById.size should be >= 0.9
    approx.count(_._3 == "pruned") should be > 0
  }

  test("q109 approx: totals intact, five monotone buckets, per-bucket " +
      "counts near the exact quintile size") {
    import spark.implicits._
    def report(mode: Option[String]) = {
      val f = () => TextAnalysis.queries("q109_surprisal_mixing")(spark, dir)
        .select("bucket", "n_docs", "min_xent_u", "max_xent_u")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      mode.fold(f())(m => withMode(m)(f()))
    }
    val exact = report(None)
    val approx = report(Some("approx"))
    approx.map(_._1) shouldBe exact.map(_._1) // buckets 1..5
    approx.map(_._2).sum shouldBe exact.map(_._2).sum // every doc bucketed
    // bucket ranges stay ordered: no doc lands below a lower bucket's max
    approx.sliding(2).foreach { case Array(lo, hi) =>
      lo._4 should be <= hi._3
    }
    // boundary jitter only: each bucket within ±20% of the exact size
    val n5 = exact.map(_._2).sum / 5.0
    approx.foreach { case (_, n, _, _) =>
      math.abs(n - n5) / n5 should be <= 0.2
    }
  }

  test("q217 approx: totals intact, ten deciles, value monotone down " +
      "the decile ladder, per-decile population near n/10") {
    import spark.implicits._
    // sf0.01 here: sf0.001 has only 15 users, too few for population-
    // jitter bounds to mean anything (a ±1 tie straddles ±33%).
    val bigDir = "/root/testdata/sf0.01"
    def report(mode: Option[String]) = {
      val f = () => graft.operators.Events.queries("q217_ltv_deciles")(
        spark, bigDir)
        .select("decile", "n_users", "sum_value_u", "share_u")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      mode.fold(f())(m => withMode(m)(f()))
    }
    val exact = report(None)
    val approx = report(Some("approx"))
    approx.map(_._1) shouldBe exact.map(_._1) // deciles 0..9
    approx.map(_._2).sum shouldBe exact.map(_._2).sum // every user binned
    approx.map(_._3).sum shouldBe exact.map(_._3).sum // value mass intact
    // per-decile mean LTV is monotone non-increasing down the ladder —
    // thresholds partition by VALUE, so boundary jitter moves members
    // between adjacent deciles but never reorders the ladder
    val means = approx.map(r => r._3.toDouble / r._2)
    means.sliding(2).foreach { case Array(hi, lo) =>
      hi should be >= lo - 1e-9
    }
    // boundary jitter only: each decile within ±20% of the exact size
    val n10 = exact.map(_._2).sum / 10.0
    approx.foreach { case (_, n, _, _) =>
      math.abs(n - n10) / n10 should be <= 0.2
    }
  }

  test("q220/q227 approx (the shared ingestDecile stage): per-source " +
      "totals intact, ten monotone deciles, counts near the exact size") {
    import spark.implicits._
    for ((qname, module) <- Seq(
        "q220_dup_trend" -> Dedup.queries,
        "q227_quality_trend" -> TextAnalysis.queries)) {
      def report(mode: Option[String]) = {
        val f = () => module(qname)(spark, dir)
          .select(org.apache.spark.sql.functions.col("source"),
            org.apache.spark.sql.functions.col("decile"),
            org.apache.spark.sql.functions.col("n_docs"))
          .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
        mode.fold(f())(m => withMode(m)(f()))
      }
      val exact = report(None)
      val approx = report(Some("approx"))
      withClue(s"$qname: ") {
        // every doc still binned, per source
        val eBySrc = exact.groupBy(_._1).view.mapValues(_.map(_._3).sum)
        val aBySrc = approx.groupBy(_._1).view.mapValues(_.map(_._3).sum)
        aBySrc.toMap shouldBe eBySrc.toMap
        // ten deciles per source, each within ±25% of the exact tenth
        approx.groupBy(_._1).foreach { case (src, rows) =>
          rows.map(_._2).sorted shouldBe (0L to 9L)
          val tenth = eBySrc(src) / 10.0
          rows.foreach { case (_, _, n) =>
            withClue(s"source $src: ") {
              math.abs(n - tenth) / tenth should be <= 0.25
            }
          }
        }
      }
    }
  }

  test("q112 approx: the agreement cross-tab keeps every (rules, gate) " +
      "margin EXACTLY (the swap only moves the low/high surprisal " +
      "split) and the low-side mass stays near the exact 60%") {
    import spark.implicits._
    def cells(mode: Option[String]) = {
      val f = () => TextAnalysis.queries("q112_quality_agreement")(spark, dir)
        .select("rules_quality", "gate_admit", "low_surprisal", "n_docs")
        .as[(String, Long, Long, Long)].collect()
      mode.fold(f())(m => withMode(m)(f()))
    }
    val exact = cells(None)
    val approx = cells(Some("approx"))
    def margins(xs: Array[(String, Long, Long, Long)]) =
      xs.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._4).sum).toMap
    margins(approx) shouldBe margins(exact) // rules+gate legs untouched
    val total = exact.map(_._4).sum
    val lowExact = exact.filter(_._3 == 1L).map(_._4).sum
    val lowApprox = approx.filter(_._3 == 1L).map(_._4).sum
    math.abs(lowApprox - lowExact).toDouble / total should be <= 0.05
  }

  test("unknown quantile mode rejects loudly") {
    intercept[IllegalArgumentException] {
      withMode("fuzzy") {
        Similarity.queries("q106_cluster_prune")(spark, dir).count()
      }
    }
  }
}
