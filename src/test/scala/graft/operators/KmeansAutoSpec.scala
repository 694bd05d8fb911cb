package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, element_at}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Full-Lloyd-loop tests on PLANTED well-separated clusters: the loop
  * must recover the planted structure, converge in a handful of rounds
  * (not maxRounds), keep the inertia trace monotone, and walk the
  * identical centroid sequence under a different partitioning (the
  * int64-exact update's whole point).
  */
class KmeansAutoSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val Dim = 8

  /** 3 orthogonal-ish planted clusters of 40 vectors each in 8-dim
    * micro-scale space. Cluster c concentrates mass on component c with
    * deterministic jitter; vec_ids interleave the clusters so the
    * first-3-ids seeding starts with one seed per cluster. */
  private def planted(parts: Int): DataFrame = {
    import spark.implicits._
    graft.functions.VectorExprs.ensureRegistered(spark)
    val rows = (0 until 120).map { i =>
      val c = i % 3
      val jitter = (j: Int) => ((i * 31 + j * 17) % 97).toLong // < 100
      val sv = Array.tabulate(Dim)(j =>
        (if (j == c) 10000L else 200L) + jitter(j))
      (i.toLong, sv)
    }
    val df = rows.toDF("vec_id", "sv").repartition(parts)
    df.withColumn("n2", graft.functions.VectorExprs.dotL(col("sv"), col("sv")))
  }

  test("planted clusters are recovered exactly and convergence takes a " +
      "handful of rounds, not the budget") {
    val run = Similarity.kmeansAuto(planted(8), k = 3, dim = Dim)
    run.rounds should be < 20
    run.rounds should be >= 2 // at least one improving + one confirming
    // Monotone inertia: each Lloyd round can only improve the total
    // assignment cosine (micro-floor slack absorbed by the eps guard).
    run.inertiaU.sliding(2).foreach {
      case Seq(a, b) => b should be >= a - 1000L
      case _ =>
    }
    // Final centroids dominate on one distinct component each — the
    // planted structure, recovered.
    val doms = run.centroids.select(col("c_id"), col("cv")).collect()
      .map { r =>
        val cv = r.getSeq[Long](1)
        cv.indices.maxBy(cv(_))
      }.toSet
    doms shouldBe Set(0, 1, 2)
  }

  test("the centroid walk is partitioning-invariant: 1, 8, and 32 " +
      "input partitions produce identical final centroids and traces") {
    def snap(parts: Int): (Seq[(Long, Seq[Long])], Seq[Long], Int) = {
      val run = Similarity.kmeansAuto(planted(parts), k = 3, dim = Dim)
      val cs = run.centroids.select(col("c_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
      (cs, run.inertiaU, run.rounds)
    }
    val a = snap(1)
    val b = snap(8)
    val c = snap(32)
    b shouldBe a
    c shouldBe a
  }

  test("the per-round plan is round-depth-constant: the final centroid " +
      "frame is a lineage-cut leaf, not a nested round tree") {
    val run = Similarity.kmeansAuto(planted(4), k = 3, dim = Dim)
    // localCheckpoint leaves plan as a Scan ExistingRDD — if a refactor
    // drops the cut, the plan string embeds every round's join tree and
    // grows with rounds (the r4/r5 driver plan-walk pathology).
    val plan = run.centroids.queryExecution.executedPlan.toString
    plan should include("ExistingRDD")
    plan.length should be < 2000
  }

  test("one driver action per round: the inertia aggregate is the only " +
      "SQL action inside the loop (plus seed + per-round leaf cuts)") {
    val emb = planted(8).localCheckpoint(true) // outside the window
    val (run, nActions) =
      graft.SqlActionCounter.countedSqlExecutions(spark) {
        Similarity.kmeansAuto(emb, k = 3, dim = Dim)
      }
    // seed checkpoint + per round (one leaf cut + one inertia action)
    nActions shouldBe (1 + 2 * run.rounds)
  }
}
