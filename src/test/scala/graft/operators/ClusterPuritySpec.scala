package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q160's Rand decomposition, pinned on a planted corpus that exercises
  * every population: an exact-dup pair inside a near-dup cluster
  * (coclustered), a near-dup pair beyond byte-equality (near-only), an
  * exact-dup pair the sketches CANNOT see — two-word docs produce no
  * shingles, so the pair never enters LSH and lands in `missed_pairs` —
  * and a unique singleton contributing nothing anywhere. */
class ClusterPuritySpec extends AnyFunSuite with SparkSpec with Matchers {

  private val T1 = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo"
  private val T2 = "zulu yankee xray whiskey victor uniform tango sierra " +
    "quill plume ember cinder"

  test("planted corpus: coclustered / missed / near-only pair counts " +
      "and exact recall") {
    import spark.implicits._
    val docs = Seq(
      (1L, T1, "sA"),                  // exact dup of 2
      (2L, T1, "sA"),
      (3L, T1 + " sierra", "sA"),      // near-dup of 1/2 (17/19 shingles)
      (4L, "hi there", "sB"),          // exact dup of 5 — but 2 words:
      (5L, "hi there", "sB"),          //   no shingles, invisible to LSH
      (6L, T2, "sB"))                  // unique singleton
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("purity_").toString
    docs.repartition(3).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q160_cluster_purity")(spark, dir).collect()
    rows should have length 1
    val r = rows.head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def v(n: String): Long = r.getLong(byName(n))

    // content partition: {1,2} and {4,5} → 2 exact pairs
    v("content_pairs") shouldBe 2L
    // clustering: {1,2,3} (3 pairs); 4,5,6 singletons
    v("cluster_pairs") shouldBe 3L
    // only (1,2) is both content-equal and co-clustered
    v("coclustered_pairs") shouldBe 1L
    // (4,5): content-equal, never sketched → the audit's catch
    v("missed_pairs") shouldBe 1L
    // (1,3),(2,3): the near-dup mass beyond byte-equality
    v("near_only_pairs") shouldBe 2L
    v("exact_recall_u") shouldBe 500000L
  }

  test("a clean corpus (no dups at all) reports all-zero pairs and " +
      "vacuous full recall") {
    import spark.implicits._
    val docs = Seq((1L, T1, "sA"), (2L, T2, "sB"))
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("purity0_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = SparkEntry.queries("q160_cluster_purity")(spark, dir)
      .collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def v(n: String): Long = r.getLong(byName(n))
    v("content_pairs") shouldBe 0L
    v("cluster_pairs") shouldBe 0L
    v("coclustered_pairs") shouldBe 0L
    v("exact_recall_u") shouldBe 1000000L // vacuously perfect
  }
}
