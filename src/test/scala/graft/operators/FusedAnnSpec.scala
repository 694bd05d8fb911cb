package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `serveFusedAnnRequest` — the fused request with the IVF-indexed
  * semantic leg (round-16 verdict task 3). Pins:
  *  (a) the IDENTITY case: when the index collapses to one cell the
  *      ANN leg IS the exact corpus scan, so ANN and exact fused must
  *      agree row-for-row (schema, ranks, rrf_u, order);
  *  (b) cell-boundedness: on a multi-cell corpus every semantically-
  *      ranked hit shares its query's cell — the candidates really
  *      come from the index, not a corpus scan;
  *  (c) the lexical leg is untouched: pure-lexical hits (r_sem = 0)
  *      carry identical lexical ranks in both variants.
  */
class FusedAnnSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val DimN = Similarity.Dim

  /** Fixture dir with documents + embeddings. `nLabels` controls the
    * cell count (per-label centroids are the coarse codebook). */
  private def writeCorpus(n: Int, nLabels: Int): String = {
    val tmp = Files.createTempDirectory("graft_fusedann_")
    tmp.toFile.deleteOnExit()
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def vec(id: Int): Array[Float] = {
      val label = id % nLabels
      val r = new scala.util.Random(900 + label)
      val c = Array.fill(DimN)(r.nextDouble() * 2 - 1)
      val rn = new scala.util.Random(7000 + id)
      Array.tabulate(DimN)(d =>
        (c(d) * 0.8 + (rn.nextDouble() * 2 - 1) * 0.4).toFloat)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until n).map(i => Row(i.toLong, vec(i).toSeq, i % nLabels)), 2),
        embSchema)
      .write.mode("overwrite")
      .parquet(tmp.resolve("embeddings.parquet").toString)
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val vocab = Vector("spark", "batch", "line", "scan", "hash", "query",
      "merge", "index", "bucket", "stream", "quartz", "zephyr")
    def text(id: Int): String = {
      val r = new scala.util.Random(id * 31 + 5)
      // a rare marker word per id block keeps the lexical leg busy
      val rare = vocab(10 + (id % 2))
      ((0 until 12).map(_ => vocab(r.nextInt(10))) :+ rare).mkString(" ")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize((0 until n).map { i =>
          val t = text(i)
          Row(i.toLong, t, "en", "src0", t.length.toLong)
        }, 2), docSchema)
      .write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    tmp.toString
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "doc_id", "r_sem", "r_lex", "rrf_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("one-cell corpus: fused-ann is row-identical to exact fused " +
      "(the ANN leg degenerates to the exact scan)") {
    val dir = writeCorpus(30, nLabels = 1)
    val ids = Seq(0L, 3L, 7L)
    val exact = rowsOf(Similarity.serveFusedRequest(spark, dir, ids))
    val ann = rowsOf(Similarity.serveFusedAnnRequest(spark, dir, ids))
    ann shouldBe exact
    exact should not be empty
  }

  test("multi-cell corpus: every semantically-ranked hit shares its " +
      "query's cell, and pure-lexical hits keep exact lexical ranks") {
    val dir = writeCorpus(40, nLabels = 3)
    val ids = Similarity.servableQueryIds(spark, dir)
    val ann = rowsOf(Similarity.serveFusedAnnRequest(spark, dir, ids))
    ann should not be empty
    val cellOf = Similarity.ivfAssigned(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ann.filter(_._3 > 0L).foreach { case (q, d, _, _, _) =>
      withClue(s"query $q doc $d: ") { cellOf(d) shouldBe cellOf(q) }
    }
    // lexical ranks agree with the exact variant wherever both list
    // the (query, doc) pair — the leg is shared code on shared data
    val exact = rowsOf(Similarity.serveFusedRequest(spark, dir, ids))
    val exactLex = exact.map(t => (t._1, t._2) -> t._4).toMap
    ann.filter(_._4 > 0L).foreach { case (q, d, _, rl, _) =>
      exactLex.get((q, d)).foreach(_ shouldBe rl)
    }
  }
}
