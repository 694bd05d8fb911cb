package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The semantic-dedup pre-flight pair-budget guard (round-16 verdict
  * task 2): before q77's edge list materializes, a one-aggregate
  * candidate bound prices it against `spark.graft.neardup
  * .autoBudgetPairs`; over budget auto-applies the per-vector degree
  * cap. Pins BOTH decisions, the explicit-knob precedence, the capped
  * run's component preservation on a planted duplicate cluster, and
  * loud rejection of bad budgets. */
class SemDedupGuardSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val DimN = Similarity.Dim

  private def writeEmb(rows: Seq[(Long, Array[Float])]): String = {
    val tmp = Files.createTempDirectory("graft_semguard_")
    tmp.toFile.deleteOnExit()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, v) => Row(id, v.toSeq, 0) }, 1), schema)
      .write.mode("overwrite")
      .parquet(tmp.resolve("embeddings.parquet").toString)
    tmp.toString
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T =
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }

  /** 8 identical vectors (a 28-pair clique) + 2 isolated ones. */
  private def cliqueDir(): String = {
    val same = Array.fill(DimN)(0.4f)
    val lonerA = Array.tabulate(DimN)(d => if (d % 2 == 0) 0.4f else -0.4f)
    val lonerB = Array.tabulate(DimN)(d => if (d % 3 == 0) -0.4f else 0.4f)
    writeEmb((0L to 7L).map(i => (i, same.clone())) ++
      Seq((8L, lonerA), (9L, lonerB)))
  }

  test("under budget (default): the guard decides uncapped") {
    val dir = cliqueDir()
    Similarity.semDedupAutoCap(spark, dir) shouldBe None
  }

  test("over budget: the guard auto-applies k = budget/|vectors| " +
      "(floored, >= 1) and the capped closure still keeps the planted " +
      "clique one component") {
    import spark.implicits._
    val dir = cliqueDir()
    withConf(Similarity.SemDedupBudgetConf -> "3") {
      // 28-pair clique bound > 3; k = max(1, 3/10) = 1
      Similarity.semDedupAutoCap(spark, dir) shouldBe Some(1)
      // degree-1 edges on an identical clique form the (i, i+1) chain
      // (cos ties break on smallest b_id), so connectivity survives
      // the cap: every clique member still collapses to canonical 0.
      val q77 = graft.SparkEntry.queries("q77_semantic_dedup")(spark, dir)
      val decisions = q77.select($"vec_id", $"canonical_vec", $"keep")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)
      decisions.filter(_._1 <= 7).map(_._2).toSet shouldBe Set(0L)
      decisions.filter(_._1 <= 7).count(_._3) shouldBe 1
      // the isolated vectors keep themselves
      decisions.filter(_._1 >= 8).foreach { case (id, canon, keep) =>
        canon shouldBe id; keep shouldBe true
      }
    }
  }

  test("an explicit maxPairs knob wins: the guard never second-guesses " +
      "the operator") {
    val dir = cliqueDir()
    withConf(Similarity.SemDedupBudgetConf -> "3",
        Similarity.MaxPairsConf -> "2") {
      Similarity.semDedupAutoCap(spark, dir) shouldBe None
    }
  }

  test("'off' disables the guard even over budget") {
    val dir = cliqueDir()
    withConf(Similarity.SemDedupBudgetConf -> "off") {
      Similarity.semDedupAutoCap(spark, dir) shouldBe None
    }
  }

  test("bad budgets reject loudly") {
    val dir = cliqueDir()
    for (bad <- Seq("three", "0", "-5"))
      withConf(Similarity.SemDedupBudgetConf -> bad) {
        an[IllegalArgumentException] should be thrownBy
          Similarity.semDedupAutoCap(spark, dir)
      }
  }

  test("the candidate bound counts Σ n(n-1)/2 over buckets and the " +
      "vector count once per vector") {
    val dir = cliqueDir()
    val (n, bound) = Similarity.semDedupPairBound(spark, dir)
    n shouldBe 10L
    // the 8-clique shares one bucket (identical vectors); loners may
    // or may not collide with it, so the bound is at least the clique
    bound should be >= 28L
  }
}
