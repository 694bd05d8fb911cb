package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** q97 fires on planted violations — an audit whose healthy output is
  * all zeros needs proof each counter actually counts. */
class IntegritySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("q97 counts orphans on both sides, dup keys, and dim drift") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_integrity_").toString
    // docs 0-4; doc 3 id duplicated
    ((0L to 4L).map(i => (i, s"doc $i", "en", "s", 5L)) :+
      ((3L, "doc 3 again", "en", "s", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // vecs for docs 0-2 (vec 2 wrong-dim), orphan vec 99, vec 1 duplicated
    val mkVec = (n: Int) => (0 until n).map(_.toFloat).toSeq
    val rows = Seq(
      Row(0L, mkVec(Similarity.Dim), 0),
      Row(1L, mkVec(Similarity.Dim), 1),
      Row(1L, mkVec(Similarity.Dim), 1), // dup key
      Row(2L, mkVec(16), 2),             // dim drift
      Row(99L, mkVec(Similarity.Dim), 3)) // dangling index entry
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$dir/embeddings.parquet")

    val r = Similarity.queries("q97_integrity")(spark, dir).collect().head
    r.getAs[Long]("n_docs") shouldBe 6L
    r.getAs[Long]("n_vecs") shouldBe 5L
    r.getAs[Long]("n_dim_mismatch") shouldBe 1L
    r.getAs[Long]("n_docs_without_vec") shouldBe 3L // docs 3 (×2) and 4
    r.getAs[Long]("n_vecs_without_doc") shouldBe 1L // vec 99
    r.getAs[Long]("n_dup_doc_ids") shouldBe 1L      // doc_id 3
    r.getAs[Long]("n_dup_vec_ids") shouldBe 1L      // vec_id 1
  }
}
