package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The LM-scoring swap (`spark.graft.lm.scoring`): the default
  * `broadcast` form (map-side graft_lm_xent over the serialized frozen
  * LM) must be BIT-identical to the original explode→groupBy→
  * vocabulary-join form — that identity is what lets the shuffle-free
  * plan be the default under unchanged oracles. Also pins the plan
  * claims: the default q89 carries the expression and NO token
  * explode; join mode has the explode and no expression. */
class LmScoringModeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  private def withMode[T](m: String)(body: => T): T =
    try { spark.conf.set(Features.LmScoringConf, m); body }
    finally spark.conf.unset(Features.LmScoringConf)

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq

  test("broadcast (default) ≡ join, bit-identical, for the decision " +
      "table (q89), the per-source triage (q95), the ingest-order " +
      "trend (q227), and the BIGRAM surprisal triage (q141)") {
    for (q <- Seq("q89_quality_gate", "q95_source_quality",
        "q227_quality_trend", "q141_bigram_lm")) {
      val default = rows(q)
      val joined = withMode("join")(rows(q))
      withClue(s"$q broadcast vs join: ") { default shouldBe joined }
      default should not be empty
    }
  }

  test("plan shapes: default q89 scores at scan position (graft_lm_xent " +
      "present, zero Generate/explode nodes); join mode keeps the " +
      "explode and never plans the expression") {
    val b = SparkEntry.queries("q89_quality_gate")(spark, dir)
      .queryExecution.sparkPlan.toString
    b should include("graft_lm_xent")
    b should not include "Generate"
    val j = withMode("join")(
      SparkEntry.queries("q89_quality_gate")(spark, dir)
        .queryExecution.sparkPlan.toString)
    j should include("Generate")
    j should not include "graft_lm_xent"
  }

  test("plan shapes, bigram order: default q141 scores at scan " +
      "position into TakeOrderedAndProject (graft_lm_xent2, zero " +
      "Generate, zero joins); join mode keeps the explode pipeline") {
    val b = SparkEntry.queries("q141_bigram_lm")(spark, dir)
      .queryExecution.sparkPlan.toString
    b should include("graft_lm_xent2")
    b should include("TakeOrderedAndProject")
    b should not include "Generate"
    b should not include "Join"
    val j = withMode("join")(
      SparkEntry.queries("q141_bigram_lm")(spark, dir)
        .queryExecution.sparkPlan.toString)
    j should include("Generate")
    j should not include "graft_lm_xent2"
  }

  test("unknown LM scoring mode rejects loudly") {
    val e = intercept[IllegalArgumentException](withMode("turbo")(
      rows("q89_quality_gate")))
    e.getMessage should include("lm.scoring")
  }

  // Round-15 advice: the earlier null-intolerant graft_lm_xent scored
  // null-lang docs 0 under coalesce while the join form scored them at
  // fallback-total max surprisal. Fixture: a null-lang doc whose token
  // mass is the LARGEST (so the fallback max(total_l) comes from the
  // null-lang rows themselves — the sentinel-shipping path), a null-text
  // doc, and ordinary docs.
  test("null-lang and null-text documents: broadcast ≡ join " +
      "bit-identically, and the null-lang doc scores fallback max " +
      "surprisal, not 0") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns.tokens
    val docs = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      org.apache.spark.sql.Row(1L, "en", "s", "the cat sat on the mat"),
      org.apache.spark.sql.Row(2L, "fr", "s", "le chat"),
      org.apache.spark.sql.Row(3L, null, "s",
        (1 to 30).map(i => s"w$i").mkString(" ")),
      org.apache.spark.sql.Row(4L, "en", "s", null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    // The lmTable derivation over the fixture corpus (null lang kept as
    // a group key, exactly like the real lmTable over untagged docs).
    val wc = docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
    val langTot = wc.groupBy(col("lang")).agg(sum(col("cnt")).as("total_l"))
      .withColumnRenamed("lang", "tl_lang")
    val lm = wc.join(langTot, col("lang") <=> col("tl_lang"))
      .select(col("lang"), col("w"), col("cnt"), col("total_l"))
    def decide(): Map[Long, (Long, Boolean, String)] =
      TextAnalysis.qualityDecisions(docs, lm).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(5), r.getBoolean(6), r.getString(7)))).toMap
    val broadcastRows = decide()
    val joinRows = withMode("join")(decide())
    broadcastRows shouldBe joinRows
    // Null-lang doc: 30 distinct tokens, fallback total = its own 30
    // (the largest lang total), every token OOV (cnt 1) →
    // floor(30·floor(10⁶·ln 30)/30) = floor(10⁶·ln 30).
    val expected = math.floor(1000000.0 * math.log(30.0)).toLong
    broadcastRows(3L)._1 shouldBe expected
    broadcastRows(3L)._1 should be > 0L
    // Null-text doc: no tokens to score — xent 0 in both forms.
    broadcastRows(4L)._1 shouldBe 0L
  }

  // A null token ELEMENT must take the OOV path (cnt 1), not
  // string-concat into a lookup of the literal vocabulary term "null"
  // (which this LM deliberately carries, heavily attested, so the
  // regression would be visible).
  test("null token elements score as OOV, never as the term 'null'") {
    import org.apache.spark.sql.functions._
    val bytes = graft.functions.LmXent.serialize(
      terms = Seq(("en", "null", 500L), ("en", "cat", 250L)),
      totals = Seq(("en", 1000L)))
    graft.functions.VectorExprs.ensureRegistered(spark)
    val df = spark.range(1).select(
      graft.functions.LmXent.xent(
        lit("en"),
        array(lit("cat"), lit(null).cast("string"), lit("cat")),
        bytes).as("x"))
    // tf: cat→2 (cnt 250), null→1 (OOV ⇒ cnt 1); total 3.
    val expected = math.floor((
      math.floor(1000000.0 * 2.0 * math.log(1000.0 / 250.0)) +
        math.floor(1000000.0 * 1.0 * math.log(1000.0 / 1.0))) / 3.0).toLong
    df.collect().head.getLong(0) shouldBe expected
  }

  // Artifact-size guard (round-15 verdict task 8): past the conf'd
  // vocabulary cap the broadcast mode must refuse to collect the LM and
  // run the join-form plan — same rows, shuffle-bearing plan, loud log.
  test("an LM over spark.graft.lm.maxBroadcastTerms falls back to the " +
      "bit-identical join plan instead of collecting the artifact " +
      "(unigram q89 AND bigram q141)") {
    val dflt = rows("q89_quality_gate")
    val dflt141 = rows("q141_bigram_lm")
    spark.conf.set(Features.LmMaxBroadcastTermsConf, "1")
    try {
      val capped = SparkEntry.queries("q89_quality_gate")(spark, dir)
      val plan = capped.queryExecution.sparkPlan.toString
      plan should not include "graft_lm_xent"
      plan should include("Generate")
      capped.collect().map(_.toString).toSeq shouldBe dflt
      val capped141 = SparkEntry.queries("q141_bigram_lm")(spark, dir)
      val plan141 = capped141.queryExecution.sparkPlan.toString
      plan141 should not include "graft_lm_xent2"
      plan141 should include("Generate")
      capped141.collect().map(_.toString).toSeq shouldBe dflt141
    } finally spark.conf.unset(Features.LmMaxBroadcastTermsConf)
    // Loud rejection of a nonsense cap.
    spark.conf.set(Features.LmMaxBroadcastTermsConf, "lots")
    try intercept[IllegalArgumentException](
      rows("q89_quality_gate")).getMessage should include(
      "maxBroadcastTerms")
    finally spark.conf.unset(Features.LmMaxBroadcastTermsConf)
  }
}
