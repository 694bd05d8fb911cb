package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q183: the corpus-trust panel must LOCALIZE — one planted feed per
  * layer (a length flood, a mislabeled feed, a boundary-confidence
  * feed) each lands on exactly its own diagnosis while clean feeds
  * read stable, and every panel number equals the parent query's own
  * output (the composition cannot drift from its parents). */
class TrustPanelSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(a: Float, b: Float): Array[Float] =
    (0 until Dim).map(d =>
      if (d < 6) a else if (d < 12) b else 0.01f).toArray

  test("one planted feed per layer, each localized to its diagnosis; " +
      "panel numbers equal the parents'") {
    import spark.implicits._
    val dir = Files.createTempDirectory("trust_").toString
    // Two clean bulks carry the corpus body (on-centroid vectors,
    // lengths 100..109); each planted feed breaks exactly ONE layer.
    final case class D(id: Long, src: String, emb: Array[Float],
      label: Int, len: Long)
    val rows =
      (0 until 20).map(i => D(i.toLong, "sCleanA",
        vec(1.0f, 0.0f), 0, 100L + i % 10)) ++
        (0 until 20).map(i => D((100 + i).toLong, "sCleanB",
          vec(0.0f, 1.0f), 1, 100L + i % 10)) ++
        // feed layer: right vectors/labels, lengths teleported +300
        (0 until 5).map(i => D((200 + i).toLong, "sLenShift",
          vec(1.0f, 0.0f), 0, 400L + i % 10)) ++
        // label layer: cluster-1 vectors shipped as label 0
        (0 until 5).map(i => D((300 + i).toLong, "sNoise",
          vec(0.0f, 1.0f), 0, 100L + i % 10)) ++
        // decision layer: boundary vectors (abstain — labels look ok)
        (0 until 5).map(i => D((400 + i).toLong, "sConf",
          vec(1.0f, 1.0f), 0, 100L + i % 10))
    rows.map(d => (d.id, d.emb, d.label))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    rows.map(d => (d.id, "x", "en", d.src, d.len))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val panel = SparkEntry.queries("q183_trust_panel")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getString(8)).toMap
    panel shouldBe Map(
      "sCleanA" -> "stable", "sCleanB" -> "stable",
      "sLenShift" -> "feed", "sNoise" -> "labels", "sConf" -> "decision")

    // the panel's numbers ARE the parents' numbers
    val got = SparkEntry.queries("q183_trust_panel")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val len = SparkEntry.queries("q176_emd_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val noise = SparkEntry.queries("q181_noise_by_source")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val conf = SparkEntry.queries("q182_confidence_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    got.foreach { case (src, (l, n, c)) =>
      l shouldBe len(src)
      n shouldBe noise(src)
      c shouldBe conf(src)
    }
  }
}
