package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The trained-codebook swap must be real and safe: with labels
  * deliberately mis-aligned to the geometry (nine labels carving up
  * one true cluster while one label covers the other nine), the label
  * codebook serves a pathologically hot cell — and switching
  * `spark.graft.ivf.codebook=trained` rebalances it through the SAME
  * assignment path; the default mode is bit-identical to an explicit
  * `label`, and a typo'd value fails loudly instead of silently
  * serving the default index. */
class IvfCodebookModeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def writeEmb(dir: String): Unit = {
    import spark.implicits._
    // 10 true clusters on disjoint dimension blocks; ids 0-9 are one
    // seed per cluster (kmeansAuto's seeding reach). Labels: clusters
    // 0-8 all carry label 0; cluster 9's vectors rotate labels 1-9.
    def vec(cluster: Int, jitter: Int): Array[Float] =
      (0 until Dim).map { d =>
        val base = if (d / 6 == cluster) 1.0f else 0.02f
        base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
      }.toArray
    val rows = (0 until 100).map { i =>
      val cluster = i % 10
      val label = if (cluster <= 8) 0 else 1 + (i / 10) % 9
      (i.toLong, vec(cluster, i), label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def maxLoad(dir: String): Long =
    SparkEntry.queries("q130_ivf_cell_profile")(spark, dir)
      .collect().map(_.getAs[Long]("load_u")).max

  test("trained codebook rebalances the label-skewed index; default " +
      "equals explicit 'label'; bad values fail loudly") {
    val dir = Files.createTempDirectory("ivfmode_").toString
    writeEmb(dir)

    val hotLabel = maxLoad(dir) // default = label codebook
    val q44Default = SparkEntry.queries("q44_ivf_ann")(spark, dir)
      .collect().toSeq
    spark.conf.set(Similarity.IvfCodebookConf, "label")
    try {
      SparkEntry.queries("q44_ivf_ann")(spark, dir)
        .collect().toSeq shouldBe q44Default

      spark.conf.set(Similarity.IvfCodebookConf, "trained")
      graft.operators.Features.clear(spark)
      val hotTrained = maxLoad(dir)
      // label mode parks ~90% of the corpus in one cell (~9e6 load);
      // the converged codebook finds the 10 real clusters (~1e6 each).
      hotLabel should be >= 5000000L
      hotTrained should be <= hotLabel / 3

      spark.conf.set(Similarity.IvfCodebookConf, "kmeans")
      an[IllegalArgumentException] should be thrownBy
        SparkEntry.queries("q130_ivf_cell_profile")(spark, dir)
    } finally {
      spark.conf.unset(Similarity.IvfCodebookConf)
      graft.operators.Features.clear(spark)
    }
  }
}
