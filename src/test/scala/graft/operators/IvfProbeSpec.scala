package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Multi-probe IVF (round-4 verdict task 6).
  *
  * Single-probe IVF has a recall cliff for queries near a cell boundary:
  * their true nearest neighbors sit just across it, in a cell the query
  * never scans. `Similarity.ivfAnn(nprobe = 2)` probes the two nearest
  * cells — the standard IVF fix, ~2× candidate work for the boundary
  * recall.
  *
  * Fixture: two clusters (= two IVF cells, since the codebook is the
  * per-label centroids). Query q0 sits just on cluster A's side of the
  * boundary, but its TRUE #1 neighbor is a boundary member of cluster B
  * — single-probe structurally cannot see it. Recall@5 is measured
  * against q38-style exact brute-force top-5 on the same data.
  */
class IvfProbeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = Similarity.Dim

  /** vec_ids 0-7 are the query set (Similarity's NQueries = 8).
    *  - q0: 0.50/0.45 split across the two half-spaces — lands in cell A;
    *  - q1-q4: bulk-A-like; q5-q7: bulk-B-like;
    *  - 8-27: cluster A bulk (label 0); 28-47: cluster B bulk (label 1);
    *  - 48: cluster B BOUNDARY member (0.45/0.50 split, label 1) —
    *    q0's true nearest neighbor (cos ≈ 0.995 vs ≈ 0.75 for bulk A).
    */
  private def plant(): String = {
    val dir = Files.createTempDirectory("graft_ivfprobe_")
    dir.toFile.deleteOnExit()
    val rnd = new scala.util.Random(7)
    def mk(lo: Float, hi: Float): Array[Float] =
      Array.tabulate(Dim) { i =>
        val base = if (i < Dim / 2) lo else hi
        base + (rnd.nextDouble() * 0.02 - 0.01).toFloat
      }
    val q0 = mk(0.50f, 0.45f)
    val qsA = (1 to 4).map(_ => mk(1.0f, 0.01f))
    val qsB = (5 to 7).map(_ => mk(0.01f, 1.0f))
    val bulkA = (0 until 20).map(_ => mk(1.0f, 0.01f))
    val bulkB = (0 until 20).map(_ => mk(0.01f, 1.0f))
    val boundaryB = mk(0.45f, 0.50f)
    val all = (Seq(q0) ++ qsA ++ qsB ++ bulkA ++ bulkB ++ Seq(boundaryB))
    val rows = all.zipWithIndex.map { case (v, i) =>
      // Labels = cells: bulk A and A-like queries are label 0, B side
      // label 1. Queries' labels only influence the centroid sums
      // marginally; the boundary member (id 48) carries label 1 and is
      // pulled into cell B by construction.
      val label = if (i == 0) 0
        else if (i <= 4) 0 else if (i <= 7) 1
        else if (i <= 27) 0 else 1
      Row(i.toLong, v.toSeq, label)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  /** (q_id, vec_id) membership of each query's top-5. */
  private def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "vec_id", "rank").collect()
      .filter(_.getInt(2) <= 5)
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recallAt5(exact: Map[Long, Set[Long]],
      ann: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      (ex intersect ann.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  test("nprobe=2 recovers the cross-boundary neighbor single-probe " +
      "structurally misses") {
    val dir = plant()
    val exact = top5(Similarity.queries("q38_cosine_topk")(spark, dir))
    val one = top5(Similarity.ivfAnn(spark, dir, k = 5, nprobe = 1))
    val two = top5(Similarity.ivfAnn(spark, dir, k = 5, nprobe = 2))
    // The planted cliff: q0's true #1 neighbor (vec 48, cell B) is
    // invisible to single-probe (q0 probes cell A) and found at nprobe=2.
    exact(0L) should contain(48L)
    one(0L) should not contain 48L
    two(0L) should contain(48L)
    val r1 = recallAt5(exact, one)
    val r2 = recallAt5(exact, two)
    r2 should be > r1
    info(f"recall@5: nprobe=1 $r1%.3f -> nprobe=2 $r2%.3f (planted)")
  }

  test("testdata sf0.001: nprobe=2 recall@5 >= single-probe (quantified)") {
    val dir = SparkSpec.Sf0001
    val exact = top5(Similarity.queries("q38_cosine_topk")(spark, dir))
    val one = top5(Similarity.ivfAnn(spark, dir, k = 5, nprobe = 1))
    val two = top5(Similarity.ivfAnn(spark, dir, k = 5, nprobe = 2))
    val r1 = recallAt5(exact, one)
    val r2 = recallAt5(exact, two)
    r2 should be >= r1
    info(f"recall@5: nprobe=1 $r1%.3f -> nprobe=2 $r2%.3f (sf0.001)")
  }

  test("default ivfAnn(k=5, nprobe=1) is exactly the q44 oracle query") {
    val dir = SparkSpec.Sf0001
    val q44 = Similarity.queries("q44_ivf_ann")(spark, dir).collect().toSeq
    val dflt = Similarity.ivfAnn(spark, dir).collect().toSeq
    dflt shouldBe q44
  }
}
