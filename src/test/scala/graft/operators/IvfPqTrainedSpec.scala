package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** `spark.graft.ivf.codebook=trained` must reach the RESIDUAL path —
  * the full FAISS-IVFPQ composition (coarse quantizer × residual PQ),
  * not just q44/q130's flat index: on a fixture whose labels are
  * deliberately mis-aligned with the geometry, residuals against the
  * kmeans-trained cells carry far less energy than residuals against
  * the label cells (that is the whole point of residual encoding — a
  * tight cell makes the same PQ bits buy less distortion). The default
  * mode stays bit-identical to explicit `label` (q137's oracle pin),
  * and a mid-session conf flip rebuilds the memoized index instead of
  * silently serving the other codebook's frames (the stale-cache-key
  * bug class round 9 closed for the BPE vocabulary). */
class IvfPqTrainedSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  /** IvfCodebookModeSpec's mis-aligned fixture: 10 true clusters on
    * disjoint dimension blocks; labels carve one cluster nine ways
    * while one label covers the other nine. */
  private def writeEmb(dir: String): Unit = {
    import spark.implicits._
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

  /** Total residual energy Σ‖v − centroid(cell(v))‖² over the corpus —
    * exact int64, straight off the residual frame. */
  private def residualSse(dir: String): Long =
    Similarity.ivfPqResiduals(spark, dir)
      .select(aggregate(col("sv"), lit(0L), (acc, x) => acc + x * x)
        .as("e"))
      .agg(sum(col("e"))).head().getLong(0)

  test("trained codebook reaches the residual index: far less residual " +
      "energy than label cells on the mis-aligned fixture; default == " +
      "explicit 'label'; a conf flip rebuilds, never serves stale frames") {
    val dir = Files.createTempDirectory("ivfpq_trained_").toString
    writeEmb(dir)

    try {
      val sseDefault = residualSse(dir)
      val q137Default = SparkEntry.queries("q137_ivfpq_adc")(spark, dir)
        .collect().toSeq

      spark.conf.set(Similarity.IvfCodebookConf, "label")
      residualSse(dir) shouldBe sseDefault
      SparkEntry.queries("q137_ivfpq_adc")(spark, dir)
        .collect().toSeq shouldBe q137Default

      // Flip WITHOUT Features.clear: the mode-suffixed memo keys must
      // rebuild the residual/code frames for the new codebook.
      spark.conf.set(Similarity.IvfCodebookConf, "trained")
      val sseTrained = residualSse(dir)
      // label mode parks 9 true clusters in one cell — its residuals
      // carry the inter-cluster geometry; trained cells are the true
      // clusters, so residual energy collapses.
      sseTrained should be <= sseDefault / 3

      // The composed serving path runs end-to-end under the trained
      // codebook and still reports every query.
      val q137Trained = SparkEntry.queries("q137_ivfpq_adc")(spark, dir)
        .collect().toSeq
      q137Trained.size shouldBe q137Default.size
      q137Trained should not be q137Default

      // And flipping BACK serves the label index again (cache keys are
      // symmetric, not first-writer-wins).
      spark.conf.set(Similarity.IvfCodebookConf, "label")
      residualSse(dir) shouldBe sseDefault
    } finally {
      spark.conf.unset(Similarity.IvfCodebookConf)
      graft.operators.Features.clear(spark)
    }
  }
}
