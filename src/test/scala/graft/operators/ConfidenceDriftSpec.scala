package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q182: confidence-distribution EMD per source. An independent
  * pure-Scala replay (same quantization, centroid sums, cosine,
  * per-mille bucketing, integer ECDF integral) must agree exactly, and
  * the planted geometry must show the property the query exists for —
  * a feed whose vectors sit near the decision boundary reads a large
  * confidence displacement while its LABELS still look healthy. */
class ConfidenceDriftSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(a: Float, b: Float): Array[Float] =
    (0 until Dim).map(d =>
      if (d < 6) a else if (d < 12) b else 0.01f).toArray

  test("independent replay agrees; the boundary-hugging feed dominates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("confdrift_").toString
    // sTight: 10 vectors per class ON its block. sMid: 5 vectors
    // exactly between the blocks, labeled 0 — labels plausible,
    // confidence collapsed.
    val rows =
      (0 until 10).map(i => (i.toLong, vec(1.0f, 0.0f), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(0.0f, 1.0f), 1)) ++
        (0 until 5).map(i => ((200 + i).toLong, vec(1.0f, 1.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    rows.map { case (id, _, _) =>
      (id, "x", "en", if (id >= 200) "sMid" else "sTight", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // ---- pure-Scala replay of the whole chain, exact integers ----
    val sv = rows.map { case (id, e, l) =>
      (id, e.map(x => math.floor(x.toDouble * 10000.0).toLong), l)
    }
    val cents = sv.groupBy(_._3).view.mapValues { vs =>
      val s = new Array[Long](Dim)
      vs.foreach(v => (0 until Dim).foreach(i => s(i) += v._2(i)))
      s
    }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def bucket(v: Array[Long]): Long = {
      val n2 = dot(v, v)
      val confS = cents.values.map { c =>
        math.floor(dot(v, c).toDouble /
          math.sqrt(n2.toDouble * dot(c, c).toDouble) * 1000000.0).toLong +
          1000000L
      }.max
      confS / 1000L // nonnegative ⇒ / == floor-div
    }
    val perSource = sv.map(v =>
      ((if (v._1 >= 200) "sMid" else "sTight"), bucket(v._2)))
    val dom = perSource.map(_._2).distinct.sorted
    val ctotN = perSource.size.toLong
    val expected = perSource.groupBy(_._1).map { case (src, vs) =>
      val stot = vs.size.toLong
      var scum = 0L; var ccum = 0L; var emd = 0L
      dom.indices.foreach { i =>
        scum += vs.count(_._2 == dom(i))
        ccum += perSource.count(_._2 == dom(i))
        val d = math.abs(1000000L * scum / stot - 1000000L * ccum / ctotN)
        if (i + 1 < dom.size) emd += d * (dom(i + 1) - dom(i))
      }
      src -> emd
    }

    val got = SparkEntry.queries("q182_confidence_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    got.view.mapValues(_._2).toMap shouldBe expected
    got("sTight")._1 shouldBe 20L
    // the boundary feed's confidence mass is far from the corpus body
    got("sMid")._2 should be > (3L * got("sTight")._2)
    // and it ranks first
    SparkEntry.queries("q182_confidence_drift")(spark, dir)
      .collect().head.getString(0) shouldBe "sMid"
  }
}
