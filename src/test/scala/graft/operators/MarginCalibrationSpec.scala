package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q171: the margin-calibration (reliability) table. A mixed fixture —
  * one clean cluster plus two labels carrying identical vector
  * multisets — must land the knife-edge population in band 0 at
  * exactly 50% recovery (the tie rule absorbs one label whole) and the
  * clean population in a wide band at 100%; every row must equal an
  * independent pure-Scala replay (canonical double-cosine assignment
  * with the lower-label tie rule, micro-floored top-2 margins, exact
  * CASE bands). */
class MarginCalibrationSpec extends AnyFunSuite with SparkSpec with Matchers {

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

  private def audit(dir: String): Map[Int, (String, Long, Long, Long)] =
    SparkEntry.queries("q171_margin_calibration")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap

  /** Independent replay over the engine's scaled frame: canonical
    * assignment (double cosine, ties to the lower label), micro-floored
    * top-2 margin, CASE bands, integer rates. */
  private def replay(dir: String): Map[Int, (Long, Long, Long)] = {
    val rows = Features.scaledEmb(spark, dir)
      .select("vec_id", "label", "sv", "n2")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val cents = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (lab, vs) =>
      val cs = Array.tabulate(Dim)(i => vs.map(_._3(i)).sum)
      (lab, cs, cs.map(x => x * x).sum)
    }
    val perVec = rows.map { case (_, lab, sv, n2) =>
      val scored = cents.map { case (cLab, cs, cn2) =>
        val dot = (0 until Dim).map(i => sv(i) * cs(i)).sum
        val cos = dot.toDouble / math.sqrt(n2.toDouble * cn2.toDouble)
        (cLab, cos, math.floor(cos * 1000000.0).toLong)
      }
      // canonical assignment: max double cosine, tie to the LOWER label
      val cell = scored.maxBy { case (cLab, cos, _) => (cos, -cLab) }._1
      val top2 = scored.map(_._3).sorted(Ordering[Long].reverse)
      val margin = top2(0) - top2(1)
      val band =
        if (margin == 0L) 0
        else if (margin < 10000L) 1
        else if (margin < 50000L) 2
        else if (margin < 200000L) 3
        else 4
      (band, if (cell == lab) 1L else 0L)
    }
    perVec.groupBy(_._1).map { case (band, vs) =>
      val n = vs.length.toLong
      val c = vs.map(_._2).sum
      band -> ((n, c, 1000000L * c / n))
    }
  }

  test("knife-edge population lands in band 0 at exactly 50% recovery; " +
      "the clean cluster recovers fully in a wide band; every row " +
      "equals the independent replay") {
    val dir = Files.createTempDirectory("mcal_").toString
    writeEmb(dir,
      (0 until 10).map(i => (i.toLong, vec(0, i), 0)) ++
        (0 until 10).map(i => ((100 + i).toLong, vec(1, i), 1)) ++
        (0 until 10).map(i => ((200 + i).toLong, vec(1, i), 2)))
    val got = audit(dir)
    got(0) shouldBe (("0_knife_edge", 20L, 10L, 500000L))
    val wide = got.filter(_._1 > 0)
    wide.values.map(_._2).sum shouldBe 10L // the clean cluster
    all(wide.values.map(_._4)) shouldBe 1000000L
    got.map { case (b, (_, n, c, r)) => b -> ((n, c, r)) } shouldBe replay(dir)
  }

  test("aligned geometry is fully calibrated: every populated band " +
      "recovers at 1000000 and matches the replay") {
    val dir = Files.createTempDirectory("mcal_ok_").toString
    writeEmb(dir, (0 until 30).map(i => (i.toLong, vec(i % 3, i), i % 3)))
    val got = audit(dir)
    got.values.map(_._2).sum shouldBe 30L
    all(got.values.map(_._4)) shouldBe 1000000L
    got.map { case (b, (_, n, c, r)) => b -> ((n, c, r)) } shouldBe replay(dir)
  }
}
