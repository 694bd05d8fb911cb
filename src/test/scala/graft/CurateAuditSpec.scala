package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `--with-audit`: the shipped corpus-health panel must be EXACTLY the
  * oracled queries' rows (the artifact cannot drift from the audited
  * surface), one JSON directory per panel member, written alongside
  * the corpus/report/manifest the run already ships. */
class CurateAuditSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("audit panel ships every member, row-identical to its query") {
    val sfDir = SparkSpec.Sf0001
    val out = Files.createTempDirectory("curate_audit_").toString + "/job"
    Curate.run(spark, sfDir, out, withAudit = true)

    Curate.AuditPanel should not be empty
    Curate.AuditPanel.foreach { name =>
      val query = SparkEntry.queries(name)(spark, sfDir)
      val cols = query.columns
      val expected = query.collect()
        .map(r => cols.map(c => String.valueOf(r.get(r.fieldIndex(c))))
          .mkString("|")).sorted
      val shipped = spark.read.json(s"$out/audit/$name")
        .selectExpr(cols.map(c => s"`$c`"): _*).collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i)))
          .mkString("|")).sorted
      withClue(s"panel $name: ") {
        shipped shouldBe expected
        expected should not be empty
      }
    }

    // the standard artifacts still ship
    spark.read.parquet(s"$out/corpus").count() should be > 0L
    spark.read.json(s"$out/report").count() should be > 0L
  }
}
