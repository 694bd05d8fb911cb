package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local SparkSession for all specs (one per test JVM — sbt forks
  * a single JVM for the test run, so suites reuse the warm session). */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // The artifact lifecycle re-ships refreshed files under stable
    // names (two specs each train their own model.gcm); without
    // overwrite, Spark fails every task AFTER the second addFile with
    // "exists and does not match contents" — the GraftSession setting,
    // mirrored here because the shared test session builds directly.
    .config("spark.files.overwrite", "true")
    .config("spark.ui.enabled", "false")
    // The 573-test suite regenerates thousands of distinct codegen
    // classes; Spark's 100-entry Janino cache thrashes exactly like the
    // round-15 bench drift (GraftSession's fix, mirrored here because
    // this session builds directly). CodegenCacheSpec's forked probes
    // are unaffected (separate JVMs).
    .config("spark.sql.codegen.cache.maxEntries", "10000")
    .appName("graft-test")
    .getOrCreate()

  val Sf0001 = "/root/testdata/sf0.001"
}
