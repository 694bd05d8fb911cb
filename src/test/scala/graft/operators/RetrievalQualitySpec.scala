package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Semantics checks for the round-5 retrieval/quality operators:
  *
  *  - q86 (BM25 top-10): on the real sf0.001 corpus, documents containing
  *    the rare query term "dup" must dominate the ranking — the idf
  *    spread doing actual work, not just tf counting.
  *  - q87 (unigram-LM quality): a document made of tokens rare for its
  *    language must out-score (higher surprisal) same-language documents
  *    made of the corpus's common tokens.
  */
class RetrievalQualitySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("q86 ranks rare-term documents first and orders by score") {
    import org.apache.spark.sql.functions.{array_contains, col, split}
    val dir = SparkSpec.Sf0001
    val rows = TextAnalysis.queries("q86_bm25")(spark, dir).collect()
    rows should have length 10
    val scores = rows.map(_.getLong(3))
    scores shouldBe scores.sorted(Ordering[Long].reverse)
    scores.last should be > 0L

    // Every doc containing the rare term "dup" outranks every doc that
    // merely matches the common terms: idf("dup") ≈ ln(19.6) vs ≈ ln(1.3),
    // so a single "dup" hit beats any common-term tf at these doc lengths.
    val dupDocs = Tables.documents(spark, dir)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val returnedDup = rows.filter(r => dupDocs(r.getLong(0))).map(_.getLong(3))
    val returnedOther = rows.filterNot(r => dupDocs(r.getLong(0))).map(_.getLong(3))
    returnedDup.nonEmpty shouldBe true
    if (returnedOther.nonEmpty)
      returnedDup.min should be > returnedOther.max
  }

  test("q91 ranks the always-together pair above independent pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pmi_").toString
    // x and y co-occur in exactly their 10 docs; z appears everywhere.
    // PMI(x,y) = ln(20·10/(10·10)) = ln 2 > 0; PMI(x,z) = ln 1 = 0;
    // filler pairs (f_i distinct per doc) never reach support 5.
    val docs = ((0L until 10L).map(i => (i, s"x y z f$i g$i", "en", "s1")) ++
      (10L until 20L).map(i => (i, s"z p q f$i g$i", "en", "s1")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = TextAnalysis.queries("q91_pmi_collocations")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(5)))
    val byPair = rows.toMap
    // the planted collocations lead with identical positive PMI
    byPair(("x", "y")) shouldBe byPair(("p", "q"))
    byPair(("x", "y")) should be > 0L
    rows.head._2 shouldBe byPair(("x", "y")) // nothing scores higher
    // independent-with-z pairs sit at PMI 0
    byPair(("x", "z")) shouldBe 0L
    byPair(("p", "z")) shouldBe 0L
  }

  test("q94 temperature sampling up-weights the minority source") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_temp_").toString
    // 90/10 split: α = 0.3 flattens to w ≈ 0.659/0.341, so with a
    // half-corpus budget the minority source's rate clamps to 1.0 while
    // the majority source samples at ≈ 50·0.659/90 ≈ 0.366.
    val docs = ((0L until 90L).map(i => (i, s"a b c d$i", "en", "big")) ++
      (90L until 100L).map(i => (i, s"e f g h$i", "en", "small")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = TextAnalysis.queries("q94_temperature_mixing")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val (rateBig, _) = rows("big")
    val (rateSmall, admittedSmall) = rows("small")
    rateSmall shouldBe 1000000L // clamped: keep ALL of the minority feed
    admittedSmall shouldBe 10L  // rate 1.0 ⇒ deterministic full admission
    rateBig should be < 400000L
    rateBig should be > 330000L
  }

  test("q87 surfaces the off-distribution document as worst-quality") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lmq_").toString
    val common = "the cat sat on the mat and the dog ran"
    val docs = ((0L until 20L).map(i => (i, common, "en", "s1")) :+
      (20L, "zyx wvu tsr qpo nml kji hgf edc", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = TextAnalysis.queries("q87_lm_quality")(spark, dir).collect()
    // worst-first: the rare-token doc leads, with strictly higher
    // surprisal than any common-token doc
    rows.head.getLong(1) shouldBe 20L
    val worst = rows.head.getLong(3)
    rows.tail.foreach(r => worst should be > r.getLong(3))
  }
}
