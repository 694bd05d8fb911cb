package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract guards: the exact conditions the external harness
  * checks (smoke rows, query/oracle key alignment). */
class SparkEntrySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("entry (driver smoke) returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query key has an oracle and vice versa") {
    SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
  }

  test("q51: HLL vocab estimate is within the asserted bound of exact") {
    val rows = SparkEntry.queries("q51_vocab_approx")(spark, SparkSpec.Sf0001)
      .collect()
    rows.length should be > 0
    // approx_ok is computed in-engine from |approx-exact|/exact ≤ 0.15;
    // a false here means the sketch (or the query) broke.
    rows.foreach(r => withClue(s"lang=${r.get(0)}: ")(
      r.getAs[Boolean]("approx_ok") shouldBe true))
  }

  test("query names are unique across suites (no silent map overwrites)") {
    val suites = Seq(
      operators.Relational.queries, operators.Events.queries,
      operators.Pipeline.queries, operators.TextAnalysis.queries,
      operators.Dedup.queries, operators.Similarity.queries,
      operators.Multimodal.queries)
    suites.map(_.size).sum shouldBe SparkEntry.queries.size
  }
}
