package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** THE SOURCE SEAM for every streaming gate in this package.
  *
  * Each gate ([[DedupStreams]], [[QualityStreams]], [[DecontamStreams]],
  * …) takes its input as a streaming `DataFrame` wearing a TABLE schema
  * (documents, embeddings, events) — never as a path, and never by
  * calling `readStream` itself. That parameter IS the Kafka seam: a
  * production deployment swaps the file source for a Kafka reader by
  * swapping the adapter that produces the frame, and the gate code
  * does not change. This object holds both adapters so the claim is a
  * code path, not a scaladoc sentence:
  *
  *  - [[fileSource]] — the sandbox/bench entry: a schema'd parquet
  *    `readStream` over a table directory (checkpointable file-source
  *    offsets).
  *  - [[fromKafkaWire]] — the production entry's parse stage: takes a
  *    frame wearing EXACTLY the columns Spark's Kafka source emits
  *    (`key`/`value` binary, `topic`, `partition`, `offset`,
  *    `timestamp`) and yields the same table-schema'd frame the file
  *    source yields. In production the input is literally
  *    `spark.readStream.format("kafka")...load()`; the spec drives the
  *    IDENTICAL parse stage with a `MemoryStream` wearing the same
  *    wire columns — proving a gate runs unchanged over either source.
  *
  * Payload contract: `value` is a UTF-8 JSON object matching the table
  * schema (the usual wire shape for a crawl/CDC feed). An unparseable
  * payload FAILS THE BATCH loudly (`raise_error` with topic/partition/
  * offset — the at-least-once replay then re-surfaces it until the
  * feed is fixed or the message is quarantined upstream); silently
  * dropping malformed rows would make the dedup/quality gates lie
  * about the feed ([[graft.pipeline.Scorer]]'s X2 silent-drop is the
  * reference's OWN documented semantics — this seam is ours, and ours
  * pages). */
object StreamSources {

  /** Schema'd parquet file stream over a table directory — the
    * sandbox/bench source ([[DedupStreams.documentSource]] delegates
    * here). */
  def fileSource(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Parse a Kafka-wire frame (`value` binary JSON + topic/partition/
    * offset provenance) into `schema`-shaped rows. Works identically on
    * the real Kafka reader's output and on any test stream wearing the
    * same columns. */
  def fromKafkaWire(raw: DataFrame, schema: StructType): DataFrame = {
    // PERMISSIVE from_json yields an ALL-NULL row (not a null struct)
    // for malformed input, so the loud-failure guard tests the first
    // schema field too: a payload that parsed but carries no key
    // field is the same page condition as one that didn't parse.
    val keyField = schema.fieldNames.head
    val parsed = raw
      .withColumn("_d", from_json(col("value").cast("string"), schema))
      .withColumn("_d",
        when(col("_d").isNull || col(s"_d.$keyField").isNull,
          raise_error(concat(
            lit("StreamSources: unparseable payload at "),
            col("topic").cast("string"), lit("/"),
            col("partition").cast("string"), lit(":"),
            col("offset").cast("string"))))
          .otherwise(col("_d")))
    parsed.select(schema.fieldNames.map(f => col(s"_d.$f")): _*)
  }

  /** [[fromKafkaWire]] pre-bound to the documents table — the shape
    * every text gate consumes. */
  def documentsFromKafkaWire(raw: DataFrame): DataFrame =
    fromKafkaWire(raw, DedupStreams.DocumentsSchema)

  /** The `embeddings` table schema — the shape the vector gates
    * ([[DecontamStreams.embeddingGate]], [[IndexStreams]],
    * [[PqStreams]]) consume. */
  val EmbeddingsSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("label",
      org.apache.spark.sql.types.IntegerType)))

  /** [[fromKafkaWire]] pre-bound to the embeddings table — the vector
    * twin of [[documentsFromKafkaWire]] (`value` is a JSON object with
    * `vec_id`, a float-array `embedding`, and `label`). */
  def embeddingsFromKafkaWire(raw: DataFrame): DataFrame =
    fromKafkaWire(raw, EmbeddingsSchema)
}
