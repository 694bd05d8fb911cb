package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The EXPLAINS.md inclusion policy, machine-checked (round-14 verdict
  * task 8): a new query must either get an `Explain.Headline` section
  * (its plan is printed and audited) or a conscious row in
  * `Explain.ShapeOwners` naming the Headline query whose audited plan
  * topology it repeats. Without this spec a query could silently skip
  * plan review — listed nowhere, printed nowhere, owned by nothing. */
class ExplainPolicySpec extends AnyFunSuite with Matchers {

  private val registered = SparkEntry.queries.keySet
  private val headline = Explain.headlineNames
  private val owners = Explain.ShapeOwners

  test("every registered query has an EXPLAINS section or a shape owner") {
    val orphans = registered.diff(headline ++ owners.keySet)
    withClue("queries with neither an EXPLAINS section nor an owner: ") {
      orphans shouldBe empty
    }
  }

  test("no stale entries: every section and owner row is a registered " +
      "query, and no query is BOTH a section and an owner row") {
    withClue("Headline names not in the registry: ") {
      headline.diff(registered) shouldBe empty
    }
    withClue("ShapeOwners keys not in the registry: ") {
      owners.keySet.diff(registered) shouldBe empty
    }
    withClue("queries listed both as a section and as owned: ") {
      headline.intersect(owners.keySet) shouldBe empty
    }
  }

  test("every owner is itself a Headline section (owners can't chain " +
      "or point at unaudited plans)") {
    val bad = owners.filterNot { case (_, o) => headline(o) }
    withClue("owner rows pointing outside Headline: ") { bad shouldBe empty }
  }
}
