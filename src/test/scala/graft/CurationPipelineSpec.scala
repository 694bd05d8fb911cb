package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.Sinks

/** End-to-end curation pipeline composed from the library's operators —
  * the workflow a training-data run executes: profile-gate → quality
  * filter → near-dup decisions → deterministic sample → partitioned
  * write → pruned read-back. Asserts the semantic invariants, not just
  * row counts. */
class CurationPipelineSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("profile → quality filter → dedup decisions → sample → partitioned write") {
    val dir = SparkSpec.Sf0001
    val docs = Tables.documents(spark, dir)

    // 1. Ingest gate: the profile must show a fully-populated corpus.
    val profile = TextAnalysis.queries("q62_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    profile("doc_id").getLong(2) shouldBe 0L            // n_nulls
    profile("doc_id").getLong(3) shouldBe docs.count()  // doc_id unique

    // 2. Quality filter: drop the 'low' grade.
    val quality = TextAnalysis.queries("q31_quality")(spark, dir)
      .select(col("doc_id").as("q_id"), col("quality"))
    // 3. Near-dup decisions: keep only cluster canonicals.
    val decisions = Dedup.queries("q60_dedup_decisions")(spark, dir)
      .select(col("doc_id").as("d_id"), col("keep"))

    val kept = docs
      .join(quality, col("doc_id") === col("q_id"))
      .join(decisions, col("doc_id") === col("d_id"))
      .filter(col("quality") =!= "low" && col("keep"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

    val keptCount = kept.count()
    keptCount should be > 0L
    keptCount should be < docs.count()

    // INVARIANT: no near-dup pair survives the decision table — for every
    // detected pair at most one side is kept.
    val keptIds = kept.select(col("doc_id"))
    val pairs = Dedup.queries("q35_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val survivingPairs = pairs
      .join(keptIds.select(col("doc_id").as("ka")), col("doc_a") === col("ka"))
      .join(keptIds.select(col("doc_id").as("kb")), col("doc_b") === col("kb"))
    survivingPairs.count() shouldBe 0L

    // 4. Deterministic 50% sample (hash-selected, reproducible).
    val sampled = kept.filter(
      graft.functions.Parity.md5u32(concat(col("doc_id").cast("string"),
        lit(":"), col("text"))) % 100L < 50L)
    val nSampled = sampled.count()
    nSampled should be > 0L
    // Re-evaluating the same predicate selects the identical set.
    sampled.select(sum(col("doc_id"))).head.getLong(0) shouldBe
      kept.filter(graft.functions.Parity.md5u32(concat(
        col("doc_id").cast("string"), lit(":"), col("text"))) % 100L < 50L)
        .select(sum(col("doc_id"))).head.getLong(0)

    // 5. Partitioned write + pruned read-back round-trips the sample.
    val out = Files.createTempDirectory("curation_").resolve("kept").toString
    Sinks.writePartitioned(sampled, out, Seq("lang"))
    val back = spark.read.parquet(out)
    back.count() shouldBe nSampled
    val en = back.filter(col("lang") === "en")
    en.count() shouldBe sampled.filter(col("lang") === "en").count()
  }
}
