package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `graft.Insights`: every shipped panel is row-identical to the
  * oracled query of the same name, and the whole session-rooted half
  * of the report rides ONE memoized sessionized build. */
class InsightsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("shipped panels are the oracled queries verbatim; one stage build") {
    val out = Files.createTempDirectory("insights_").toString + "/report"
    val s = spark.newSession()
    try {
      Insights.run(s, SparkSpec.Sf0001, out)
      Insights.Panels.foreach { name =>
        val shipped = spark.read.json(s"$out/$name")
        val q = SparkEntry.queries(name)(spark, SparkSpec.Sf0001)
        withClue(name) {
          shipped.count() shouldBe q.count()
          // JSON round-trips longs/strings losslessly; compare as sets
          // of canonical string rows over name-sorted columns.
          val cols = q.columns.sorted
          def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
            df.select(cols.head, cols.tail: _*).collect()
              .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
          canon(shipped) shouldBe canon(q)
        }
      }
      val builds = graft.operators.Features.buildCountsFor(s)
        .filter { case (k, _) => k.endsWith("#sessionized") }
      builds.values.toSeq shouldBe Seq(1)
    } finally graft.operators.Features.clear(s)
  }
}
