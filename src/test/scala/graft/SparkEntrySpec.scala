package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract guards: the exact conditions the external harness
  * checks (smoke rows, query/oracle key alignment). */
class SparkEntrySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("entry (driver smoke) returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracle key has a query; only q51 is deliberately un-oracled") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    o.subsetOf(q) shouldBe true
    (q -- o) shouldBe Set("q51_vocab_approx")
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
