package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Accessors for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * Every engine query reads parquet through these so Catalyst's column
  * pruning and predicate pushdown reach the `FileScan` — at 100 TB a scan
  * that reads unneeded columns is the first thing that kills a job.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader
    * rejects outright, so it is read as raw nanos (legacy flag) and
    * rebuilt as a microsecond timestamp — and plain TIMESTAMP(MICROS),
    * which Spark reads natively as TIMESTAMP_NTZ. Both normalize to the
    * SAME session-TZ `TimestampType` column (the session runs UTC, so
    * the NTZ→TZ cast is value-preserving), keeping every downstream
    * window/lag/date_trunc and the DuckDB oracle (`CAST(ts AS
    * TIMESTAMP)` truncates ns, no-ops on µs) bit-identical either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
