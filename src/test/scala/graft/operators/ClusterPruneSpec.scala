package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted-fixture test for q106 prototypicality pruning: eight
  * orthogonal seed directions anchor eight clusters; each cluster gets
  * jittered members plus (for cluster 0) one PURE-direction prototype
  * and one orthogonal-heavy outlier. The prototype must fall in the
  * pruned quarter, the outlier must survive with the worst rank in its
  * cluster, and every cluster must prune exactly floor(n/4) members.
  */
class ClusterPruneSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("prototypical members are pruned, diverse tail is kept, " +
      "per-cluster prune count is exactly floor(n/4)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("prune_").toString

    // Seeds: ids 0..7 are the unit directions e0..e7 (q106 seeds on
    // vec_id < 8). Members: ids 8..103 round-robin over the clusters,
    // each its seed direction plus small deterministic jitter. Two
    // plants in cluster 0: id 104 is EXACTLY e0 (the prototype), id
    // 105 is mostly e8 with a small e0 component — orthogonal to every
    // seed except a positive sliver toward seed 0, so it lands in
    // cluster 0 with the lowest centroid cosine (the diverse tail).
    val jitter = (i: Int, j: Int) => (((i * 31 + j * 17) % 97) - 48) / 2000.0f
    val rows =
      (0 until 8).map { i =>
        (i.toLong, Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f))
      } ++
      (8 until 104).map { i =>
        val c = i % 8
        (i.toLong, Array.tabulate(64)(j =>
          (if (j == c) 1.0f else 0.0f) + jitter(i, j)))
      } ++ Seq(
        (104L, Array.tabulate(64)(j => if (j == 0) 1.0f else 0.0f)),
        (105L, Array.tabulate(64)(j =>
          if (j == 0) 0.25f else if (j == 8) 0.95f else 0.0f)))
    rows.map { case (id, e) => (id, e, (id % 10).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = SparkEntry.queries("q106_cluster_prune")(spark, dir).collect()
    out.length shouldBe 106

    // one decision per vector; decisions are a partition of the corpus
    out.map(_.getLong(0)).toSet.size shouldBe 106
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (_, members) =>
      val n = members.length
      members.head.getLong(4) shouldBe n.toLong
      members.count(_.getString(5) == "pruned") shouldBe (n / 4)
      // the pruned set is exactly the top-ranked quarter
      members.filter(_.getString(5) == "pruned")
        .map(_.getLong(3)).sorted shouldBe (1L to (n / 4).toLong).toArray
    }

    val plantProto = out.find(_.getLong(0) == 104L).get
    val plantOutlier = out.find(_.getLong(0) == 105L).get
    // both plants landed in cluster 0 as constructed
    plantProto.getLong(1) shouldBe 0L
    plantOutlier.getLong(1) shouldBe 0L
    // the pure-direction prototype is in the pruned quarter
    plantProto.getString(5) shouldBe "pruned"
    // the orthogonal-heavy outlier survives with its cluster's worst rank
    plantOutlier.getString(5) shouldBe "kept"
    plantOutlier.getLong(3) shouldBe plantOutlier.getLong(4)
    val cluster0 = byCluster(0L)
    plantOutlier.getLong(2) shouldBe cluster0.map(_.getLong(2)).min
  }
}
