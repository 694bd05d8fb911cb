package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** q56 golden test: the distributed min-label propagation must equal a
  * driver-side union-find over the same near-dup pairs (tiny at
  * sf0.001, so the exact reference answer is computable locally). */
class DedupClusterSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Seq[Long]] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      val sorted = ms.sorted
      sorted.head -> sorted
    }
  }

  test("q56 clusters equal a local union-find over the q35 pairs") {
    val pairs = Dedup.queries("q35_minhash_lsh")(spark, SparkSpec.Sf0001)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    pairs should not be empty // the testdata plants near-dups at every SF

    val expected = unionFind(pairs).map { case (canon, ms) =>
      (canon, ms.size.toLong, ms.max, ms.sum)
    }.toSet

    val got = Dedup.queries("q56_dedup_clusters")(spark, SparkSpec.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe expected
    // Every cluster groups ≥2 docs and is keyed by its minimum member.
    got.foreach { case (canon, n, maxDoc, _) =>
      n should be >= 2L
      maxDoc should be > canon
    }
  }
}
