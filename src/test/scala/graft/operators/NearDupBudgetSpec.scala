package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The q40 pair BUDGET (`spark.graft.neardup.maxPairs`): capped runs
  * keep exactly each a_id's top-k partners by (cos desc, b_id asc) —
  * deterministic, a subset of the uncapped report — and a cap above
  * every partner-list length reproduces the uncapped (oracle-pinned)
  * output bit-for-bit. Typos reject loudly. */
class NearDupBudgetSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  /** The fixture corpus is pair-sparse at small SFs (no partner list
    * exceeds 2 at sf0.001/sf0.01 — q40's blowup is an sf0.1+/~sf1
    * phenomenon), so the cap-bites test plants ONE dense 6-member
    * near-dup group: every pair's cosine ≈ 1, all in one sign bucket,
    * partner lists up to 5 long. */
  private def plantDenseGroup(): String = {
    val tmp = Files.createTempDirectory("graft_neardup_budget_")
    tmp.toFile.deleteOnExit()
    val DimN = Similarity.Dim
    val rows = (0 until 6).map { i =>
      val v = Array.fill(DimN)(0.5f)
      v(DimN - 1) = 0.5f + i * 0.001f // tiny spread: cos stays ~0.999+
      Row(i.toLong, v.toSeq, i)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite")
      .parquet(tmp.resolve("embeddings.parquet").toString)
    tmp.toString
  }

  private def uncapped(d: String = dir): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    Similarity.embeddingNearDup(spark, d,
        Similarity.TestdataNearDupCosine)
      .select("a_id", "b_id", "cos")
      .as[(Long, Long, Double)].collect().toSeq
  }

  private def withCap[T](k: String)(body: => T): T =
    try { spark.conf.set(Similarity.MaxPairsConf, k); body }
    finally spark.conf.unset(Similarity.MaxPairsConf)

  test("cap=2 keeps exactly each a_id's top-2 by (cos desc, b_id)") {
    import spark.implicits._
    val dense = plantDenseGroup()
    val full = uncapped(dense)
    full.groupBy(_._1).values.exists(_.size > 2) shouldBe true // cap bites
    val expected = full.groupBy(_._1).flatMap { case (_, ps) =>
      ps.sortBy(p => (-p._3, p._2)).take(2)
    }.toSet

    val capped = withCap("2") {
      Similarity.embeddingNearDup(spark, dense,
          Similarity.TestdataNearDupCosine)
        .select("a_id", "b_id", "cos")
        .as[(Long, Long, Double)].collect().toSet
    }
    capped shouldBe expected
    capped.subsetOf(full.toSet) shouldBe true
    capped.groupBy(_._1).values.foreach(_.size should be <= 2)
  }

  test("a cap above every partner-list length is the uncapped report") {
    import spark.implicits._
    val full = uncapped()
    val maxList = full.groupBy(_._1).values.map(_.size).max
    withCap((maxList + 1).toString) {
      Similarity.embeddingNearDup(spark, dir,
          Similarity.TestdataNearDupCosine)
        .select("a_id", "b_id", "cos")
        .as[(Long, Long, Double)].collect().toSeq
    } shouldBe full
  }

  test("non-integer and non-positive caps reject loudly") {
    intercept[IllegalArgumentException] {
      withCap("two") { Similarity.embeddingNearDup(spark, dir) }
    }
    intercept[IllegalArgumentException] {
      withCap("0") { Similarity.embeddingNearDup(spark, dir) }
    }
  }
}
