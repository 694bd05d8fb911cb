package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.BloomExprs

/** Bloom membership pre-filter for incremental dedup (q72): prune a
  * batch's fingerprint/band rows against few-hundred-KB corpus sketches
  * BEFORE the corpus joins shuffle anything. Correctness hinges on
  * no-false-negatives (pruning is output-invariant); usefulness hinges
  * on most of a genuinely-new batch being discarded at scan position.
  */
class BloomPrefilterSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("q72 (bloom-prefiltered) decisions equal q69 exactly") {
    val q69 = Dedup.queries("q69_incremental_dedup")(spark, SparkSpec.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val q72 = Dedup.queries("q72_bloom_incremental")(spark, SparkSpec.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    q72 shouldBe q69 // same rows, same order — bit-identical cascade output
    q69.count(_._2 != "unique") should be > 0 // the cascade actually fired
  }

  test("no false negatives: every inserted key tests positive " +
      "(interpreted AND codegen paths)") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val keys = (0 until 1000).map(i => s"member-$i")
    val bf = keys.toDF("k").stat.bloomFilter("k", 2000, 0.01)
    val bytes = BloomExprs.serialize(bf)
    // Codegen path (filter over a DataFrame).
    val hits = keys.toDF("k")
      .filter(BloomExprs.mightContain(col("k"), bytes)).count()
    hits shouldBe 1000L
    // Null propagates (doesn't throw, doesn't match).
    val withNull = (keys :+ null).toDF("k")
      .filter(BloomExprs.mightContain(col("k"), bytes)).count()
    withNull shouldBe 1000L
  }

  test("a disjoint batch is mostly pruned at the configured fpp") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val corpus = (0 until 5000).map(i => s"corpus-doc-$i")
    val bf = corpus.toDF("k").stat.bloomFilter("k", 5000, 0.01)
    val bytes = BloomExprs.serialize(bf)
    val novel = (0 until 5000).map(i => s"novel-doc-$i")
    val survivors = novel.toDF("k")
      .filter(BloomExprs.mightContain(col("k"), bytes)).count()
    // fpp 0.01 over 5000 novel keys ⇒ ~50 expected false positives;
    // allow generous slack, but the point stands: ≥97% of a new batch
    // never reaches the corpus join.
    survivors.toDouble / 5000 should be < 0.03
  }

  test("mergeBlooms survives a short-doc increment: fp rows but NO " +
      "signature rows (minhashSigOf drops <3-token docs)") {
    import spark.implicits._
    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "crawl", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docsDf(Seq((1L, (0 until 30).map(i => s"c$i").mkString(" "))))
    val base = Dedup.corpusBlooms(
      Dedup.contentFpOf(corpus), Dedup.minhashSigOf(corpus),
      expectedItems = 1000)
    // The increment: a doc with TWO tokens — fp exists, signature does
    // not (no word-3-grams). Pre-fix this NPE'd inside mergeBlooms.
    val short = docsDf(Seq((100L, "tiny doc")))
    val merged = Dedup.mergeBlooms(base,
      Dedup.contentFpOf(short), Dedup.minhashSigOf(short))
    // The short doc's fp was folded in — its exact duplicate now
    // survives the fp pre-filter.
    val shortFp = Dedup.contentFpOf(short).collect().head.getString(1)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(merged.fpBloom))
    bf.mightContainBinary(shortFp.getBytes("UTF-8")) shouldBe true
  }

  test("corpusBlooms on an EMPTY bootstrap corpus builds match-nothing " +
      "sketches instead of throwing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val blooms = Dedup.corpusBlooms(
      Dedup.contentFpOf(empty), Dedup.minhashSigOf(empty),
      expectedItems = 1000)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(blooms.fpBloom))
    bf.mightContainBinary("anything".getBytes("UTF-8")) shouldBe false
  }

  test("SQL surface: graft_bloom_contains callable from spark.sql") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val bf = Seq("a", "b").toDF("k").stat.bloomFilter("k", 10, 0.01)
    Seq(("a", BloomExprs.serialize(bf))).toDF("k", "bloom")
      .createOrReplaceTempView("bloom_t")
    // The bloom arg must be foldable — pass it as a literal.
    val lit = BloomExprs.serialize(bf)
      .map(b => f"${b & 0xff}%02x").mkString
    spark.sql(
      s"SELECT graft_bloom_contains(k, x'$lit') AS hit FROM bloom_t")
      .collect().head.getBoolean(0) shouldBe true
  }
}
