package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q204: mutual-kNN symmetry over the q193 star geometry — the exact
  * edge set is hand-derivable, so the mutual share is a pinned
  * rational: the C↔P₁…P₅ links and the P₁…P₅ clique are reciprocal
  * (30 directed edges), the P₆…P₈ citations are the asymmetric hub
  * links (15 edges), share 30/45 = 2/3. */
class MutualKnnSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("star geometry: exactly 30 of 45 edges reciprocated") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mutual_").toString
    def vec(extra: Int): Array[Float] = {
      val v = Array.fill(64)(0.0f)
      (0 until 8).foreach(v(_) = 0.5f)
      if (extra >= 0) v(extra) = 0.5f
      v
    }
    val emb = (0L, vec(-1), 0) +: (1 to 8).map(i => (i.toLong, vec(7 + i), 0))
    emb.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q204_mutual_knn")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    got.toSeq shouldBe Seq((0, 45L, 30L, 666666L))

    // q193 over the same dir rides the SAME memoized edge table: the
    // knnEdges build closure must have run exactly once this session.
    SparkEntry.queries("q193_hubness")(spark, dir).collect()
    val builds = Features.buildCountsFor(spark)
      .filter { case (k, _) => k.contains("#knnEdges#") && k.startsWith(dir) }
    builds.values.toSeq shouldBe Seq(1)
  }
}
