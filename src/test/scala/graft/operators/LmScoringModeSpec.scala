package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The LM-scoring swap (`spark.graft.lm.scoring`): the default
  * `broadcast` form (map-side graft_lm_xent over the serialized frozen
  * LM) must be BIT-identical to the original explode→groupBy→
  * vocabulary-join form — that identity is what lets the shuffle-free
  * plan be the default under unchanged oracles. Also pins the plan
  * claims: the default q89 carries the expression and NO token
  * explode; join mode has the explode and no expression. */
class LmScoringModeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  private def withMode[T](m: String)(body: => T): T =
    try { spark.conf.set(Features.LmScoringConf, m); body }
    finally spark.conf.unset(Features.LmScoringConf)

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq

  test("broadcast (default) ≡ join, bit-identical, for the decision " +
      "table (q89), the per-source triage (q95), and the ingest-order " +
      "trend (q227)") {
    for (q <- Seq("q89_quality_gate", "q95_source_quality",
        "q227_quality_trend")) {
      val default = rows(q)
      val joined = withMode("join")(rows(q))
      withClue(s"$q broadcast vs join: ") { default shouldBe joined }
      default should not be empty
    }
  }

  test("plan shapes: default q89 scores at scan position (graft_lm_xent " +
      "present, zero Generate/explode nodes); join mode keeps the " +
      "explode and never plans the expression") {
    val b = SparkEntry.queries("q89_quality_gate")(spark, dir)
      .queryExecution.sparkPlan.toString
    b should include("graft_lm_xent")
    b should not include "Generate"
    val j = withMode("join")(
      SparkEntry.queries("q89_quality_gate")(spark, dir)
        .queryExecution.sparkPlan.toString)
    j should include("Generate")
    j should not include "graft_lm_xent"
  }

  test("unknown LM scoring mode rejects loudly") {
    val e = intercept[IllegalArgumentException](withMode("turbo")(
      rows("q89_quality_gate")))
    e.getMessage should include("lm.scoring")
  }
}
