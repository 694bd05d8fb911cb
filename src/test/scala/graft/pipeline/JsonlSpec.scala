package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** JSONL ingest/egress: explicit schema, corrupt-line quarantine
  * (PERMISSIVE) vs loud failure (FAILFAST), and a lossless round-trip
  * through the writer. */
class JsonlSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  private def corpus(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft_jsonl_", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toFile.deleteOnExit()
    f.toString
  }

  private val mixed = Seq(
    """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
    """{"doc_id": 2, "text": "hola", "lang": "es"}""",
    """{not json at all""",
    """{"doc_id": 4, "text": "ok", "lang": "en"}""")

  test("PERMISSIVE: malformed lines are quarantined, not fatal") {
    // Spark disallows queries touching ONLY the corrupt column on a raw
    // JSON source; cache materializes the full rows first (documented
    // workaround).
    val df = Sources.jsonl(spark, corpus(mixed), schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    good.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 4L)
    bad.count() shouldBe 1L
    bad.select("_corrupt_record").head.getString(0) should include("not json")
  }

  test("FAILFAST: a corrupt line aborts the read (contract-ingest mode)") {
    an[Exception] should be thrownBy
      Sources.jsonl(spark, corpus(mixed), schema, failFast = true)
        .select("doc_id").collect()
  }

  test("writeJsonl round-trips the documents table losslessly") {
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001)
    val out = Files.createTempDirectory("graft_jsonl_out_").resolve("docs").toString
    Sinks.writeJsonl(docs, out, maxRecordsPerFile = 100)
    val back = Sources.jsonl(spark, out,
      docs.schema.asInstanceOf[StructType])
      .drop("_corrupt_record")
    back.count() shouldBe docs.count()
    // Value-level equality via anti-join in both directions.
    back.exceptAll(docs).count() shouldBe 0L
    docs.exceptAll(back).count() shouldBe 0L
    // Sharding bound respected.
    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
    parts should be >= (docs.count() / 100L).toInt
  }
}
