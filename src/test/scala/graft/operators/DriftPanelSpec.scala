package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q174: the per-source drift-localization panel. Three planted feeds
  * each trip exactly one layer — a length flood reads `feed`, an
  * off-direction encoder reads `representation`, a label collapse
  * with corpus-shaped vectors reads `decision` — while the two clean
  * feeds read `stable`; and every panel row equals the side-by-side
  * join of the three parent queries' own outputs (the composition
  * claim: the panel invents no numbers).
  *
  * Fixture sizing is deliberate: sources must be large enough that
  * Laplace smoothing over the fixed domains doesn't self-alarm them
  * (a handful of docs reads as drifted in EVERY marginal), and the
  * drifted feeds small enough not to pollute the corpus marginal into
  * alarming the clean sources — the exact trade a production marginal
  * faces. */
class DriftPanelSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int, jitter: Int): Array[Float] =
    (0 until Dim).map { d =>
      val base = if (d / 6 == cluster) 1.0f else 0.02f
      base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
    }.toArray

  test("each planted layer shift is localized to its own diagnosis, " +
      "and every row equals the parents' side-by-side join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dpanel_").toString

    // Two big clean feeds anchor the corpus marginals: PSI-bucket-3
    // lengths, the full 10-label domain uniformly, vectors on the
    // matching label cluster.
    var id = -1L
    def next(): Long = { id += 1; id }
    final case class R(docId: Long, source: String, nChars: Long,
        v: Array[Float], label: Int)
    val clean = for (s <- Seq("clean_a", "clean_b"); i <- 0 until 2000)
      yield { val l = i % 10; R(next(), s, 200L + i % 7, vec(l, i), l) }
    // feed plant (50 docs): lengths land in PSI bucket 7, everything
    // else clean-shaped
    val flood = for (i <- 0 until 50)
      yield { val l = i % 10; R(next(), "len_flood", 9000L + i, vec(l, i), l) }
    // representation plant (500 docs): clean lengths and labels,
    // vectors on a band (cluster 10, dims 60-63) no clean doc uses
    val rot = for (i <- 0 until 500)
      yield { val l = i % 10; R(next(), "encoder_rot", 200L + i % 7,
        vec(10, i), l) }
    // decision plant (300 docs): clean lengths, corpus-shaped vector
    // MIX (clusters 0-9 uniformly, independent of the label), labels
    // collapsed to 0
    val skew = for (i <- 0 until 300)
      yield R(next(), "label_skew", 200L + i % 7, vec(i % 10, i), 0)

    val all = clean ++ flood ++ rot ++ skew
    all.map(r => (r.docId, r.source, r.nChars))
      .toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    all.map(r => (r.docId, r.v, r.label))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val panel = SparkEntry.queries("q174_drift_panel")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getString(8))))
      .toMap
    panel.keySet shouldBe
      Set("clean_a", "clean_b", "len_flood", "encoder_rot", "label_skew")

    panel("clean_a")._8 shouldBe "stable"
    panel("clean_b")._8 shouldBe "stable"
    panel("len_flood")._8 shouldBe "feed"
    panel("encoder_rot")._8 shouldBe "representation"
    panel("label_skew")._8 shouldBe "decision"

    // the single-layer plants trip ONLY their own flag
    val (_, _, _, _, fLen, fLab, fEmb, _) = panel("len_flood")
    (fLen, fLab, fEmb) shouldBe ((true, false, false))
    val (_, _, _, _, rLen, rLab, rEmb, _) = panel("encoder_rot")
    (rLen, rLab, rEmb) shouldBe ((false, false, true))
    val (_, _, _, _, sLen, sLab, sEmb, _) = panel("label_skew")
    (sLen, sLab, sEmb) shouldBe ((false, true, false))

    // composition: every number is the parent query's own output
    val lenP = TextAnalysis.queries("q117_source_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val labP = SparkEntry.queries("q126_label_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val embP = SparkEntry.queries("q100_embedding_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((src, (nDocs, lenPsi, labPsi, embCos, _, _, _, _)) <- panel) {
      (nDocs, lenPsi) shouldBe lenP(src)
      labPsi shouldBe labP(src)
      embCos shouldBe embP(src)
    }
  }

  test("the panels read MEMOIZED parents: running each parent, then its " +
      "panel, then the panel again builds every parent frame exactly once") {
    val s = spark.newSession()
    try {
      for (q <- Seq("q117_source_psi", "q126_label_psi",
          "q100_embedding_drift", "q174_drift_panel", "q174_drift_panel",
          "q176_emd_drift", "q181_noise_by_source", "q182_confidence_drift",
          "q183_trust_panel", "q183_trust_panel"))
        SparkEntry.queries(q)(s, SparkSpec.Sf0001).count()
      val counts = Features.buildCountsFor(s)
      val parentKeys = counts.keys.filter(k =>
        Seq("q117SourcePsi", "q126LabelPsi", "q100EmbDrift", "q176EmdDrift",
          "q181NoiseBySource", "q182ConfDrift").exists(k.endsWith))
      parentKeys should have size 6
      val rebuilt = counts.view.filterKeys(parentKeys.toSet).filter(_._2 > 1)
      withClue(s"panel parents rebuilt: $rebuilt") { rebuilt shouldBe empty }
    } finally Features.clear(s)
  }
}
