package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** JSONL corpus reader — the wire format LLM training corpora actually
    * arrive in (one JSON document per line). Schema is explicit (never
    * inferred: inference is a full extra pass over 100 TB and schema
    * drift should fail loudly, not adapt silently); malformed lines land
    * in `corruptCol` instead of killing the job (PERMISSIVE), so the
    * ingest gate can count and quarantine them — the M3 sentinel policy
    * applied to ingest. Set `failFast = true` to make any corrupt line
    * abort instead (contract-ingest mode). */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record",
      failFast: Boolean = false): DataFrame = {
    val reader = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
    reader.json(path)
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
