package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The q40 multi-band index (`spark.graft.neardup.lshBands`): banded
  * runs must (a) never admit a below-threshold pair (banding moves
  * recall/cost only — the cosine verify is identical), (b) CATCH a
  * planted near-dup pair that a single WIDE table misses when the pair
  * disagrees on one early sign (the reason bands exist), and (c) at
  * the default (1 band) reproduce the oracle-pinned single-table
  * output bit-for-bit. Typos and over-wide configurations reject
  * loudly. */
class NearDupBandsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val DimN = Similarity.Dim

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val tmp = Files.createTempDirectory("graft_neardup_bands_")
    tmp.toFile.deleteOnExit()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, v) => Row(id, v.toSeq, 0) }, 1), schema)
      .write.mode("overwrite")
      .parquet(tmp.resolve("embeddings.parquet").toString)
    tmp.toString
  }

  private def pairs(d: String): Set[(Long, Long)] = {
    import spark.implicits._
    Similarity.embeddingNearDup(spark, d, Similarity.TestdataNearDupCosine)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T =
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }

  test("a near-dup pair straddling one early sign flip: the single " +
      "32-bit table misses it, 2x32 banding catches it in band 1") {
    // base vector: positive everywhere; the twin flips ONE sign inside
    // the first 32 components (bucket keys differ in table 1) while
    // the cosine stays >= threshold (one small component of many)
    val base = Array.tabulate(DimN)(d => if (d == 3) 0.02f else 0.5f)
    val twin = base.clone(); twin(3) = -0.02f
    val dir = writeEmb(Seq((0L, base), (1L, twin)))

    withConf(Similarity.LshBitsConf -> "32") {
      pairs(dir) shouldBe empty // single wide table: sign 3 splits them
    }
    withConf(Similarity.LshBitsConf -> "32",
        Similarity.LshBandsConf -> "2") {
      pairs(dir) shouldBe Set((0L, 1L)) // band over dims 32..63 agrees
    }
  }

  test("banding never admits a below-threshold pair, and pairs dedup " +
      "across bands (a pair caught twice ships once)") {
    import spark.implicits._
    // two identical vectors (caught by BOTH bands) + one orthogonal
    val same = Array.fill(DimN)(0.4f)
    val other = Array.tabulate(DimN)(d => if (d % 2 == 0) 0.4f else -0.4f)
    val dir = writeEmb(Seq((0L, same), (1L, same.clone()), (2L, other)))
    withConf(Similarity.LshBitsConf -> "16",
        Similarity.LshBandsConf -> "4") {
      val got = Similarity.embeddingNearDup(spark, dir,
        Similarity.TestdataNearDupCosine)
        .select("a_id", "b_id", "cos")
        .as[(Long, Long, Double)].collect()
      got.map(t => (t._1, t._2)).toSeq shouldBe Seq((0L, 1L)) // once, not 4x
      all(got.map(_._3)) should be >= Similarity.TestdataNearDupCosine
    }
  }

  test("the default is the oracle-pinned single table; bad and " +
      "over-wide configurations reject loudly") {
    val dir = SparkSpec.Sf0001
    val single = pairs(dir)
    withConf(Similarity.LshBandsConf -> "1") {
      pairs(dir) shouldBe single
    }
    withConf(Similarity.LshBandsConf -> "nope") {
      an[IllegalArgumentException] should be thrownBy pairs(dir)
    }
    withConf(Similarity.LshBitsConf -> "32",
        Similarity.LshBandsConf -> "3") { // 96 > 64 components
      an[IllegalArgumentException] should be thrownBy pairs(dir)
    }
  }
}
