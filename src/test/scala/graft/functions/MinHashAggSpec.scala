package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFns._

/** The single-buffer sketch aggregate must produce EXACTLY the
  * signatures of the declarative k-column form q35 uses — same
  * permutation family, same corpus, byte-for-byte. Also exercises
  * partial aggregation (merge path) by forcing multiple input
  * partitions. */
class MinHashAggSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("graft_minhash equals the declarative k-column signature on the corpus") {
    TextExprs.ensureRegistered(spark)
    val hashed = graft.operators.Features
      .hashedShingles(spark, SparkSpec.Sf0001)
      .repartition(7, col("doc_id")) // force non-trivial merge path

    val viaAgg = hashed.groupBy(col("doc_id"))
      .agg(MinHashAgg.minhash(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

    val viaColumns = hashed.groupBy(col("doc_id"))
      .agg(min(perm(0, col("h"))).as("m0"),
        (1 until MinHashK).map(i => min(perm(i, col("h"))).as(s"m$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to MinHashK).map(r.getLong(_)).toVector)
      .toMap

    viaAgg.keySet shouldBe viaColumns.keySet
    viaAgg.foreach { case (doc, sig) =>
      withClue(s"doc $doc: ") { sig shouldBe viaColumns(doc) }
    }
  }

  test("graft_minhash is callable from SQL") {
    TextExprs.ensureRegistered(spark)
    graft.operators.Features.hashedShingles(spark, SparkSpec.Sf0001)
      .createOrReplaceTempView("hs")
    val row = spark.sql(
      "SELECT doc_id, graft_minhash(h) AS sig FROM hs GROUP BY doc_id LIMIT 1")
      .head()
    row.getSeq[Long](1).length shouldBe MinHashK
  }
}
