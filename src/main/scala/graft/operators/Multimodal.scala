package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Multimodal (opaque-binary) column handling, declarative surface.
  *
  * The reference's real multimodal payload is image bytes fetched per
  * manifest row (S2, `/root/reference/java/PredictBatchMapperCluster
  * .java:51-60`) and decoded in Python (M3). Here the *column* treatment
  * is generalized: media as `BinaryType` + typed metadata, with the
  * driver testdata's `documents.text` bytes standing in for media blobs
  * (the container has no image codecs — see [[graft.pipeline.Media]] for
  * the typed decode-stub pipeline).
  *
  * Scale posture: metadata extraction is per-row codegen'd expressions
  * over a scan — no shuffle; the kind/size profile is one
  * partial-aggregable groupBy. Binary content is never shuffled — only
  * its fingerprint and derived metadata move.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Portable uniform hash of a binary column (md5-hex prefix as u32) —
    * binary twin of [[graft.functions.Parity.md5u32]]. */
  private def md5u32b(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  private def md5u32bSql(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** The blob view of a document: UTF-8 bytes in both engines. DuckDB's
    * `md5` only accepts VARCHAR, so oracle-side fingerprints hash the
    * string — identical bytes, identical digest. */
  private val content: Column = col("text").cast("binary")
  private val contentSql = "CAST(text AS BLOB)"
  private val contentMd5Sql = "md5(text)"
  private val contentHMd5Sql = "md5(text || 'h')"

  /** Deterministic media kind: stand-in for a file-extension / magic-byte
    * sniff. */
  private val kind: Column = element_at(
    array(lit("image"), lit("audio"), lit("video")),
    (col("doc_id") % 3L).cast("int") + 1)
  private val kindSql =
    "(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1]"

  // ---------------------------------------------------------------- q42
  /** Binary-object metadata extraction: byte length, content fingerprint,
    * fake-decoded dimensions (hash-derived stand-ins for a real codec's
    * output — the *plumbing* is what scales, not the codec). */
  private def q42(spark: SparkSession, dir: String): DataFrame = {
    val h = md5u32b(content)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        kind.as("kind"),
        length(content).cast(LongType).as("n_bytes"),
        md5(content).as("fp"),
        (h % 1920L + 1L).as("width"),
        (md5u32b(concat(content, lit("h").cast("binary"))) % 1080L + 1L)
          .as("height"),
        when(kind === "video", h % 240L + 1L).otherwise(1L).as("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q42Sql = {
    val h = s"(('0x' || substr($contentMd5Sql, 1, 8))::BIGINT)"
    val h2 = s"(('0x' || substr($contentHMd5Sql, 1, 8))::BIGINT)"
    s"""SELECT doc_id,
       |  $kindSql AS kind,
       |  CAST(octet_length($contentSql) AS BIGINT) AS n_bytes,
       |  $contentMd5Sql AS fp,
       |  ($h % 1920) + 1 AS width,
       |  ($h2 % 1080) + 1 AS height,
       |  CASE WHEN $kindSql = 'video' THEN ($h % 240) + 1 ELSE 1 END AS n_frames
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q43
  /** Media profile per kind: object counts, total/avg bytes, distinct
    * fingerprints (exact binary dedup cardinality per modality). */
  private def q43(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), kind.as("kind"),
        length(content).cast(LongType).as("n_bytes"), md5(content).as("fp"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_objects"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("fp")).as("n_distinct"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("kind"))
  }

  private val q43Sql =
    s"""SELECT kind,
       |  count(*) AS n_objects,
       |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  count(DISTINCT fp) AS n_distinct,
       |  max(n_bytes) AS max_bytes
       |FROM (SELECT $kindSql AS kind,
       |        CAST(octet_length($contentSql) AS BIGINT) AS n_bytes,
       |        $contentMd5Sql AS fp
       |      FROM documents)
       |GROUP BY kind
       |ORDER BY kind""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q42_binary_meta"   -> (q42 _),
    "q43_media_profile" -> (q43 _))

  val oracles: Map[String, String] = Map(
    "q42_binary_meta"   -> q42Sql,
    "q43_media_profile" -> q43Sql)
}
