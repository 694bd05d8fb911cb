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

  // ------------------------------------------------------------------
  // Partition-aware accessors (round-15: the 100 TB layout posture).
  //
  // A warehouse deployment stores its fact tables DATE-PARTITIONED so
  // date-bounded reads prune at the FILE LISTING, not the row filter.
  // These accessors expose that layout without forking the queries:
  // when `<dir>/<name>_part` exists (written by
  // [[graft.tools.ScaleData.generatePartitioned]] — Hive-style
  // `o_month=.../day=...` directories), the read returns the partition
  // column for real and a filter on it becomes `PartitionFilters`
  // (static pruning) or a DPP subquery (join-driven pruning). On the
  // flat driver testdata the same column is DERIVED in the projection,
  // so every query and its DuckDB oracle are layout-agnostic —
  // identical results, pruning activating exactly when the layout
  // supports it. Date bounds stay exactly translatable because both
  // columns quantize to whole days/months: `o_month >= Y-01-01` ⟺ `o_orderdate >=
  // Y-01-01 00:00:00` (year bounds align with month boundaries).
  // ------------------------------------------------------------------
  private def hasPart(spark: SparkSession, dir: String, name: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/${name}_part")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    } catch { case _: Exception => false }

  /** orders + `o_month` (first-of-month DATE of o_orderdate):
    * partition column under the partitioned layout, derived expression
    * on flat testdata. MONTH granularity, not day — the 100× harness
    * measured daily directories SLOWER than flat (small-files tax,
    * BENCH_NOTES r15); month dirs carry ~190k rows each and
    * month-aligned bounds (q05's whole years) prune identically. */
  def ordersDated(spark: SparkSession, dir: String): DataFrame =
    if (hasPart(spark, dir, "orders"))
      spark.read.parquet(s"$dir/orders_part")
        .withColumn("o_orderdate",
          expr("o_orderdate").cast(org.apache.spark.sql.types.TimestampType))
    else
      orders(spark, dir).withColumn("o_month",
        expr("CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE)"))

  /** documents, preferring the SOURCE-partitioned layout when it
    * exists: `source` is an ordinary column in both layouts (identical
    * schema), but under `documents_part` a `source` equi-filter/join
    * prunes whole source directories at the file listing (q250's DPP
    * drill). Flat reads are unchanged. */
  def documentsBySource(spark: SparkSession, dir: String): DataFrame =
    if (hasPart(spark, dir, "documents"))
      spark.read.parquet(s"$dir/documents_part")
    else documents(spark, dir)

  /** events + `day` (DATE of ts): partition column under the
    * partitioned layout, derived expression on flat testdata. */
  def eventsDated(spark: SparkSession, dir: String): DataFrame =
    if (hasPart(spark, dir, "events"))
      spark.read.parquet(s"$dir/events_part")
        .withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))
    else
      events(spark, dir).withColumn("day", expr("CAST(ts AS DATE)"))
}
