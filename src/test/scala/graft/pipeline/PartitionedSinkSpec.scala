package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The partitioned writer must produce a layout whose readers get
  * planning-time partition pruning — asserted on the physical plan, not
  * just on results. */
class PartitionedSinkSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("writePartitioned: lang=... directories, pruned scan on read-back") {
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001)
    val out = Files.createTempDirectory("part_sink_").resolve("docs").toString
    Sinks.writePartitioned(docs, out, Seq("lang"))

    // Hive-style directory layout, one per partition value.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    dirs should not be empty

    val read = spark.read.parquet(out).filter(col("lang") === "en")
    read.count() shouldBe docs.filter(col("lang") === "en").count()

    // Planning-time pruning: the scan carries the partition filter and
    // selects only the lang=en files.
    val scan = read.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    scan.partitionFilters.map(_.sql).mkString(" ") should include("lang")
    scan.selectedPartitions.partitionCount shouldBe 1
  }
}
