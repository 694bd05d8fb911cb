package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q189: dup-cluster density. The formula layer is pinned on
  * hand-planted graphs (a 5-node path must read 4/10 = `chain`, a
  * triangle 3/3 = `clique`, a 4-node path 3/6 = `dense` — the exact
  * band boundaries); the end-to-end query is pinned on a planted
  * corpus where identical-copy groups are pairwise-verified cliques. */
class DupDensitySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("planted path/triangle/4-path graphs read chain/clique/dense " +
      "with exact densities") {
    import spark.implicits._
    // components: path 1-2-3-4-5; triangle 10-11-12; path 20-21-22-23
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("doc_a", "doc_b")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L), (23L, 20L))
      .toDF("id", "lbl")

    val got = Dedup.clusterDensityOver(labels, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap

    got(1L) shouldBe ((5L, 4L, 10L, 400000L, "chain"))
    got(10L) shouldBe ((3L, 3L, 3L, 1000000L, "clique"))
    got(20L) shouldBe ((4L, 3L, 6L, 500000L, "dense"))
  }

  test("end-to-end: identical-copy groups are pairwise-verified " +
      "cliques at density exactly 1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dens_").toString
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def doc(seed: Int): String =
      (0 until 40).map(j => vocab((seed * 7 + j * 3) % 12) + seed.toString)
        .mkString(" ")
    val quad = (0 until 4).map(i => (i.toLong, doc(100)))
    val pair = (4 until 6).map(i => (i.toLong, doc(200)))
    val unique = (6 until 26).map(i => (i.toLong, doc(i)))
    (quad ++ pair ++ unique).map { case (id, t) =>
      (id, t, "en", s"src${id % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q189_cluster_density")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getString(5)))).toMap

    got.values.toSet shouldBe Set(
      (4L, 6L, 1000000L, "clique"), // the 4-copy group: all 6 pairs
      (2L, 1L, 1000000L, "clique")) // the pair
  }
}
