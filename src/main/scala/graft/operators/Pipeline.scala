package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.Parity._

/** The reference's own pipeline (SURVEY.md §2, S1→F1→F2→M1→M4→M6→P1→SH1→K1)
  * re-expressed as declarative Catalyst queries over the `documents` table.
  *
  * The reference classifies images; its *dataflow* semantics — manifest
  * scan, trim/empty filter, filename sanitize, label-dictionary lookup,
  * per-row top-1 scoring with a sentinel error policy, `%.4f`-style
  * formatting, KV reshape, global key sort — are model-independent. Here
  * the neural scorer (M4) is replaced by a deterministic md5-derived stub
  * (same shape: `row → (label index, probability)`) so the whole pipeline
  * is DuckDB-oracle-checkable bit-for-bit; the typed/batched execution
  * scaffold with a pluggable scorer (the production path for a real model)
  * lives in [[graft.pipeline.Infer]] and is golden-tested to agree with
  * q27 exactly.
  *
  * Scale posture: q26/q27 are scan-shaped (narrow projection, per-row
  * codegen'd expressions, zero shuffles before the output sort); q28's
  * global sort is a range-partitioned exchange (Spark samples ranges — the
  * analog of the reference's single-reducer total order, but parallel);
  * q29 is one partial-aggregable groupBy on a 30-value key.
  */
object Pipeline {

  type Q = (SparkSession, String) => DataFrame

  /** The reference's 30-class label dictionary, exactly as its runtime
    * derives it: sorted subdirectory names of `class_folder.zip`
    * (`/root/reference/python/predict_batch_threaded_local.py:48-50`;
    * shipped via `/root/reference/java/PredictDriverCluster.java:51`).
    * Index ↔ name mapping depends on this sort order. */
  val Labels: IndexedSeq[String] = IndexedSeq(
    "aerosol_cans", "aluminum_food_cans", "aluminum_soda_cans",
    "cardboard_boxes", "cardboard_packaging", "clothing", "coffee_grounds",
    "disposable_plastic_cutlery", "eggshells", "food_waste",
    "glass_beverage_bottles", "glass_cosmetic_containers", "glass_food_jars",
    "magazines", "newspaper", "office_paper", "paper_cups",
    "plastic_cup_lids", "plastic_detergent_bottles",
    "plastic_food_containers", "plastic_shopping_bags",
    "plastic_soda_bottles", "plastic_straws", "plastic_trash_bags",
    "plastic_water_bottles", "shoes", "steel_food_cans", "styrofoam_cups",
    "styrofoam_food_containers", "tea_bags")

  private val labelsArray: Column = array(Labels.map(lit): _*)
  private val labelsSqlList: String =
    Labels.map(l => s"'$l'").mkString("[", ", ", "]")

  /** S1 analog: manifest row — an HDFS-path-like string per document
    * (the reference's manifest rows, `/root/reference/imagelist1.txt:1`,
    * are exactly this shape). Deliberately contains a space so F2's
    * sanitize is observable. */
  private def manifestPath: Column =
    concat(lit("/user/data/"), col("source"), lit("/doc "),
      col("doc_id").cast("string"), lit(".jpg"))

  private val manifestPathSql =
    "('/user/data/' || source || '/doc ' || CAST(doc_id AS VARCHAR) || '.jpg')"

  /** F2: the reference's filename sanitize — every char outside
    * `[A-Za-z0-9._-]` becomes `_`
    * (`/root/reference/java/PredictBatchMapperCluster.java:23,56-57`).
    * Applied to the basename, as the reference does. */
  def sanitize(c: Column): Column =
    regexp_replace(c, "[^A-Za-z0-9._-]", "_")

  def sanitizeSql(e: String): String =
    s"regexp_replace($e, '[^A-Za-z0-9._-]', '_', 'g')"

  /** M4 stub: deterministic top-1 class index in [0, 30). */
  private def classIdx: Column = md5u32(col("text")) % lit(Labels.size.toLong)

  private def classIdxSql = s"(${md5u32Sql("text")} % ${Labels.size})"

  /** M4 stub: 4-digit probability mantissa in [1000, 9999] — i.e. top-1
    * prob ∈ [0.1, 0.9999], always above the 1/30 uniform floor a real
    * softmax top-1 would have. Kept as an integer so the `%.4f` format
    * (M6, `/root/reference/python/predict_batch_threaded_local.py:160`)
    * is pure string assembly — no float formatting divergence between
    * engines. */
  private def probMantissa: Column =
    md5u32(concat(col("text"), lit(":p"))) % lit(9000L) + lit(1000L)

  private def probMantissaSql =
    s"((${md5u32Sql("text || ':p'")} % 9000) + 1000)"

  /** M3 error policy analog: a blank document is the "undecodable image" —
    * sentinel `(labels(0), 0.0)` exactly as the reference emits on decode
    * failure (`/root/reference/python/predict_batch_threaded_local.py:108`,
    * index fallback `:159`). */
  private def isBlank: Column = length(trim(col("text"))) === 0

  private val isBlankSql = "(len(trim(text)) = 0)"

  // ---------------------------------------------------------------- q26
  /** S1 + F1 + F2: manifest scan, trim/empty-filter, sanitized local
    * filename for every surviving row. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        manifestPath.as("path"),
        sanitize(concat(lit("doc "), col("doc_id").cast("string"), lit(".jpg")))
          .as("safe_name"))
      .orderBy(col("doc_id"))
  }

  private val q26Sql =
    s"""SELECT doc_id,
       |  $manifestPathSql AS path,
       |  ${sanitizeSql("'doc ' || CAST(doc_id AS VARCHAR) || '.jpg'")} AS safe_name
       |FROM documents
       |WHERE len(trim(text)) > 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q27
  /** M1 + M4(stub) + M3-policy + M6: per-row top-1 classification with
    * the label dictionary, sentinel error policy, and `%.4f` formatting. */
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        manifestPath.as("path"),
        when(isBlank, lit(Labels.head))
          .otherwise(element_at(labelsArray, (classIdx + 1L).cast("int")))
          .as("label"),
        when(isBlank, lit(0.0))
          .otherwise(probMantissa.cast(DoubleType) / 10000.0).as("prob"),
        when(isBlank, lit("0.0000"))
          .otherwise(concat(lit("0."), probMantissa.cast("string")))
          .as("prob_str"))
      .orderBy(col("path"))
  }

  private val q27Sql =
    s"""SELECT $manifestPathSql AS path,
       |  CASE WHEN $isBlankSql THEN '${Labels.head}'
       |       ELSE ($labelsSqlList)[CAST($classIdxSql AS INTEGER) + 1] END AS label,
       |  CASE WHEN $isBlankSql THEN 0.0
       |       ELSE CAST($probMantissaSql AS DOUBLE) / 10000.0 END AS prob,
       |  CASE WHEN $isBlankSql THEN '0.0000'
       |       ELSE '0.' || CAST($probMantissaSql AS VARCHAR) END AS prob_str
       |FROM documents
       |ORDER BY path""".stripMargin

  // ---------------------------------------------------------------- q28
  /** P1 + SH1 + R1 + K1 semantics: KV reshape (`value = class + "," +
    * prob`) and the global key sort the MR shuffle performs
    * (`/root/reference/java/PredictBatchMapperCluster.java:117`,
    * `PredictReducerCSV.java:9-11`). The TSV sink itself (tab separator,
    * single part file) is exercised in [[graft.pipeline.Sinks]]. */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    q27(spark, dir)
      .select(col("path").as("k"),
        concat_ws(",", col("label"), col("prob_str")).as("v"))
      .orderBy(col("k"))
  }

  private val q28Sql =
    s"""SELECT path AS k, label || ',' || prob_str AS v
       |FROM ($q27Sql)
       |ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Classification-result analytics (SURVEY.md §2 extension table):
    * per-class counts, deterministic average confidence, low-confidence
    * share — the queries a user of the reference runs over its TSV. */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    q27(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_docs"),
        davg(col("prob")).as("avg_prob"),
        sum(when(col("prob") < 0.3, 1L).otherwise(0L)).as("n_low_conf"),
        max(col("prob")).as("max_prob"))
      .orderBy(col("label"))
  }

  private val q29Sql =
    s"""SELECT label,
       |  count(*) AS n_docs,
       |  ${d2dSql("sum(CAST(prob AS DECIMAL(18,4)))")} / CAST(count(*) AS DOUBLE) AS avg_prob,
       |  CAST(sum(CASE WHEN prob < 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_conf,
       |  max(prob) AS max_prob
       |FROM ($q27Sql)
       |GROUP BY label
       |ORDER BY label""".stripMargin

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q26_manifest_sanitize" -> (q26 _),
    "q27_classify_stub"     -> (q27 _),
    "q28_kv_sorted"         -> (q28 _),
    "q29_class_analytics"   -> (q29 _))

  val oracles: Map[String, String] = Map(
    "q26_manifest_sanitize" -> q26Sql,
    "q27_classify_stub"     -> q27Sql,
    "q28_kv_sorted"         -> q28Sql,
    "q29_class_analytics"   -> q29Sql)
}
