package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The retrieval serving CLI: served rows must be EXACTLY the oracled
  * query's rows (the CLI cannot drift from the audited surface), the
  * query-file filter must restrict per id, `--eval` must ship q168's
  * scorecard, and the usage/output-dir contracts must hold. */
class ServeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val sfDir = SparkSpec.Sf0001

  private def fusedRows(dir: String): Set[(Long, Long, Long, Long, Long)] =
    spark.read.json(s"$dir/results")
      .select("q_id", "doc_id", "r_sem", "r_lex", "rrf_u")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet

  test("served fused top-k == q144's rows; --eval ships q168's " +
      "scorecard; one result file") {
    val out = Files.createTempDirectory("serve_").toString + "/job"
    Serve.run(Array(sfDir, out, "--eval"), Some(spark)) shouldBe 0

    val expected = SparkEntry.queries("q144_rrf_fusion")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    fusedRows(out) shouldBe expected
    expected should not be empty

    val eval = spark.read.json(s"$out/eval")
      .select("retriever", "n_queries", "mrr_u")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val evalExpected = SparkEntry
      .queries("q168_retrieval_eval")(spark, sfDir)
      .select("retriever", "n_queries", "mrr_u")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    eval shouldBe evalExpected
    eval.map(_._1) shouldBe Set("dense", "lsh", "ivf")
  }

  test("--queries restricts to the listed ids (manifest discipline: " +
      "trim, blanks, #-comments); unknown ids answer nothing") {
    val dir = Files.createTempDirectory("serve_q_")
    val qf = dir.resolve("queries.txt")
    Files.writeString(qf, "# panel for today\n 1 \n\n3\n999999\n")
    val out = dir.toString + "/job"
    Serve.run(Array(sfDir, out, "--queries", qf.toString),
      Some(spark)) shouldBe 0
    val got = fusedRows(out)
    got.map(_._1) shouldBe Set(1L, 3L)
    got shouldBe SparkEntry.queries("q144_rrf_fusion")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("q_id").isin(1L, 3L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  test("the ivf REQUEST path (id-bounded --queries) serves rows " +
      "IDENTICAL to q44 filtered to the ids — the driver-memoized " +
      "panel + batch-pruned cell scan may change the plan, never a " +
      "value; unknown ids answer nothing") {
    val dir = Files.createTempDirectory("serve_req_")
    val qf = dir.resolve("queries.txt")
    Files.writeString(qf, "2\n5\n999999\n")
    val out = dir.toString + "/job"
    Serve.run(Array(sfDir, out, "--retriever", "ivf",
      "--queries", qf.toString), Some(spark)) shouldBe 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id", "cell", "rank")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
      .toSet
    val got = rows(spark.read.json(s"$out/results"))
    got.map(_._1) shouldBe Set(2L, 5L)
    got shouldBe rows(SparkEntry.queries("q44_ivf_ann")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("q_id").isin(2L, 5L)))
  }

  test("the fused REQUEST path (id-bounded --queries on the DEFAULT " +
      "retriever) serves rows IDENTICAL to q144 filtered to the ids — " +
      "the memoized panel + heap top-k + postings probe may change the " +
      "plan, never a value; unknown ids answer nothing") {
    val dir = Files.createTempDirectory("serve_freq_")
    val qf = dir.resolve("queries.txt")
    Files.writeString(qf, "0\n4\n6\n999999\n")
    val out = dir.toString + "/job"
    Serve.run(Array(sfDir, out, "--queries", qf.toString),
      Some(spark)) shouldBe 0
    val got = fusedRows(out)
    got.map(_._1) shouldBe Set(0L, 4L, 6L)
    got shouldBe SparkEntry.queries("q144_rrf_fusion")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("q_id").isin(0L, 4L, 6L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    // Unknown-only ids: the request path answers nothing, like a query
    // with no candidates.
    val qf2 = dir.resolve("queries2.txt")
    Files.writeString(qf2, "999999\n")
    val out2 = dir.toString + "/job2"
    Serve.run(Array(sfDir, out2, "--queries", qf2.toString),
      Some(spark)) shouldBe 0
    // an empty result ships an empty part file — read as text (json
    // schema inference can't see an all-empty dir)
    spark.read.text(s"$out2/results").count() shouldBe 0L
  }

  test("every retriever serves its own oracled query's rows") {
    for ((flag, qname) <- Seq("dense" -> "q38_cosine_topk",
        "lsh" -> "q39_lsh_ann", "ivf" -> "q44_ivf_ann")) {
      val out = Files.createTempDirectory(s"serve_$flag").toString + "/job"
      Serve.run(Array(sfDir, out, "--retriever", flag),
        Some(spark)) shouldBe 0
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("q_id", "vec_id", "rank")
        .collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue)) // rank is int direct, long via JSON
        .toSet
      val got = rows(spark.read.json(s"$out/results"))
      got shouldBe rows(SparkEntry.queries(qname)(spark, sfDir))
    }
  }

  test("the ivf retriever honors spark.graft.ivf.codebook: serving " +
      "under 'trained' ships the trained-codebook q44 rows") {
    val conf = graft.operators.Similarity.IvfCodebookConf
    spark.conf.set(conf, "trained")
    try {
      val out = Files.createTempDirectory("serve_tc_").toString + "/job"
      Serve.run(Array(sfDir, out, "--retriever", "ivf"),
        Some(spark)) shouldBe 0
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("q_id", "vec_id", "rank")
        .collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue))
        .toSet
      rows(spark.read.json(s"$out/results")) shouldBe
        rows(SparkEntry.queries("q44_ivf_ann")(spark, sfDir))
    } finally {
      spark.conf.unset(conf)
      graft.operators.Features.clear(spark)
    }
  }

  test("usage errors and the output-dir contract exit 1") {
    Serve.run(Array(sfDir), Some(spark)) shouldBe 1
    Serve.run(Array(sfDir, "/tmp/x", "--retriever", "bm42"),
      Some(spark)) shouldBe 1
    Serve.run(Array(sfDir, "/tmp/x", "--queries"), Some(spark)) shouldBe 1
    val out = Files.createTempDirectory("serve_dup_").toString
    Serve.run(Array(sfDir, out), Some(spark)) shouldBe 1 // exists already
  }
}
