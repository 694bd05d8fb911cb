package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** THE memoization regression pin: the shared pair/label/feature stages
  * back ~15 audit queries (q37/q88/q96/q108/q110/q112/q129/q142, the
  * funnel family, the vector suite…), and the q56-class regression —
  * a stage silently re-building per consumer — is invisible in any one
  * query's plan while multiplying the corpus cost by the consumer
  * count. This spec replays the ENTIRE oracled suite in bench order
  * (sorted names, exactly `Bench`'s loop) inside a fresh session and
  * asserts every memoized stage's build closure ran EXACTLY once. */
class FeatureBuildOnceSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("every memoized stage builds exactly once across a bench-order " +
      "replay of the full oracled suite") {
    // A fresh session = a fresh cache namespace (the session UUID keys
    // the registry), so counts start at zero regardless of what other
    // suites already warmed in the shared test session.
    val s = spark.newSession()
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted
      names.foreach { n =>
        SparkEntry.queries(n)(s, SparkSpec.Sf0001).count()
      }
      val counts = Features.buildCountsFor(s)
      // The suite rides the full registry: if this shrinks, a stage
      // stopped being memoized (each consumer now pays the derivation).
      counts.size should be >= 20
      val rebuilt = counts.filter(_._2 > 1)
      withClue(s"stages built more than once: $rebuilt") {
        rebuilt shouldBe empty
      }
    } finally Features.clear(s)
  }
}
