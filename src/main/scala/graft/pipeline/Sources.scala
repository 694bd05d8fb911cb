package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1 + F1 + F2: manifest source and filename hygiene.
  *
  * The reference's job input is a text manifest, one HDFS image path per
  * line (`/root/reference/java/PredictDriverCluster.java:38,42`;
  * `imagelist1.txt:1`). `spark.read.textFile` gives the same
  * line-splitting with automatic partitioning over splits.
  */
object Sources {

  /** Manifest scan: trimmed, empty-dropped lines
    * (`/root/reference/java/PredictBatchMapperCluster.java:48-49`). A
    * UTF-8 BOM on the first line — present in the reference's own sample
    * manifest — is stripped, matching what HDFS `TextInputFormat` +
    * trim-consuming code observes. */
  def manifest(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path)
      .select(trim(regexp_replace(col("value"), "^﻿", "")).as("value"))
      .filter(length(col("value")) > 0)
      .as[String]
  }

  /** F2: safe local filename from a path's basename — every char outside
    * `[A-Za-z0-9._-]` becomes `_`
    * (`/root/reference/java/PredictBatchMapperCluster.java:23,56-57`). */
  def sanitizeFileName(name: String): String =
    name.replaceAll("[^A-Za-z0-9._-]", "_")

  def basename(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i >= 0) path.substring(i + 1) else path
  }
}
