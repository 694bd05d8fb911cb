package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q170: the decision-margin audit. Every per-label row must equal an
  * independent pure-Scala replay (exact int64 centroid sums, the same
  * one-multiply-one-sqrt-one-divide cosine, micro-floor, top-2 gap);
  * labels carrying identical vector multisets — equal centroids, every
  * assignment a knife-edge — must read margin exactly 0. */
class MarginAuditSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  private def vec(cluster: Int, jitter: Int): Array[Float] =
    (0 until Dim).map { d =>
      val base = if (d / 6 == cluster) 1.0f else 0.02f
      base + (((jitter * 7 + d * 3) % 5) - 2) * 0.01f
    }.toArray

  private def writeEmb(dir: String,
      rows: Seq[(Long, Array[Float], Int)]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  private def audit(dir: String): Map[Int, (Long, Long, Long, Long)] =
    SparkEntry.queries("q170_margin_audit")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap

  /** Pure-Scala replay over the engine's own scaled frame: exact int64
    * centroid sums, the same cosine double math, micro-floor, top-2. */
  private def replay(dir: String): Map[Int, (Long, Long, Long, Long)] = {
    val rows = Features.scaledEmb(spark, dir)
      .select("vec_id", "label", "sv", "n2")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val cents = rows.groupBy(_._2).map { case (lab, vs) =>
      val cs = Array.tabulate(Dim)(i => vs.map(_._3(i)).sum)
      lab -> ((cs, cs.map(x => x * x).sum))
    }
    val margins = rows.map { case (_, lab, sv, n2) =>
      val cos = cents.toSeq.map { case (_, (cs, cn2)) =>
        val dot = (0 until Dim).map(i => sv(i) * cs(i)).sum
        math.floor(dot.toDouble / math.sqrt(n2.toDouble * cn2.toDouble)
          * 1000000.0).toLong
      }.sorted(Ordering[Long].reverse)
      (lab, cos(0) - cos(1))
    }
    margins.groupBy(_._1).map { case (lab, ms) =>
      val vals = ms.map(_._2)
      lab -> ((vals.length.toLong, vals.min, vals.sum / vals.length,
        vals.sum))
    }
  }

  test("every per-label row equals the independent replay on aligned " +
      "geometry, with strictly positive margins") {
    val dir = Files.createTempDirectory("marg_ok_").toString
    writeEmb(dir, (0 until 30).map(i => (i.toLong, vec(i % 3, i), i % 3)))
    val got = audit(dir)
    got shouldBe replay(dir)
    all(got.values.map(_._2)) should be > 0L // min margin per label
  }

  test("identical vector multisets under two labels read margin exactly " +
      "0 — equal centroids make every assignment a knife-edge") {
    val dir = Files.createTempDirectory("marg_dup_").toString
    writeEmb(dir,
      (0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(1, i), 1)) ++
        (0 until 10).map(i => ((200 + i).toLong, vec(1, i), 2)))
    val got = audit(dir)
    got(1) shouldBe ((10L, 0L, 0L, 0L))
    got(2) shouldBe ((10L, 0L, 0L, 0L))
    got(0)._2 should be > 0L
    got shouldBe replay(dir)
  }
}
