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

  test("star CC labels a 1000-link chain in O(log n) rounds, not " +
      "O(diameter)") {
    import spark.implicits._
    // Worst case for one-hop min propagation: a single path component of
    // diameter 1000 (the one-hop loop would need ~1000 shuffle rounds).
    // Node ids are bit-reversed so the component min sits mid-chain —
    // no accidental head start from monotone ordering.
    def scramble(i: Long): Long = java.lang.Long.reverse(i) >>> 48
    val chain = (0L until 1000L).map(i => (scramble(i), scramble(i + 1)))
      .toDF("a", "b")
    val (labels, rounds) = Dedup.ccLabelsStar(chain)
    val lbls = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    lbls.length shouldBe 1001 // every chain node labelled
    val expectedMin = (0L to 1000L).map(scramble).min
    lbls.map(_._2).toSet shouldBe Set(expectedMin) // ONE component
    // log2(1001) ≈ 10; the star operators take a handful of rounds —
    // orders of magnitude under the 1000-round diameter bound.
    rounds should be <= 20
  }

  test("auto-escalation: a chain graph exhausts the hop budget and " +
      "finishes on star operators in budget + O(log n) total rounds") {
    import spark.implicits._
    def scramble(i: Long): Long = java.lang.Long.reverse(i) >>> 48
    val chain = (0L until 1000L).map(i => (scramble(i), scramble(i + 1)))
    val sym = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val run = Dedup.ccLabelsAuto(sym)
    run.escalated shouldBe true
    run.hopRounds shouldBe Dedup.CcHopBudget // budget exhausted, not converged
    // log2(1001) ≈ 10 on the contracted graph — nowhere near the ~1000
    // rounds the one-hop loop alone would need.
    run.starRounds should be <= 20
    // Labels are still exactly right: one component, keyed by its min.
    val lbls = run.labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    lbls.length shouldBe 1001
    val expectedMin = (0L to 1000L).map(scramble).min
    lbls.map(_._2).toSet shouldBe Set(expectedMin)
  }

  test("auto-escalation: clique-shaped dup graphs converge in-budget and " +
      "never escalate") {
    val pairs = Dedup.queries("q35_minhash_lsh")(spark, SparkSpec.Sf0001)
      .select("doc_a", "doc_b")
    val sym = pairs.union(pairs.select(
        org.apache.spark.sql.functions.col("doc_b"),
        org.apache.spark.sql.functions.col("doc_a")))
      .toDF("src", "dst")
    val run = Dedup.ccLabelsAuto(sym)
    run.escalated shouldBe false
    run.hopRounds should be <= Dedup.CcHopBudget
    // And the labels equal the driver-side union-find ground truth.
    val got = run.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = unionFind(pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq)
      .flatMap { case (canon, ms) => ms.map(_ -> canon) }
    got shouldBe expected
  }

  test("ccLabelsAuto runs EXACTLY one driver action per hop round, plus " +
      "init and the leaf cut — no second pass, no plan re-walk") {
    // Round-5/6 verdict pin: rounds 4 and 5 each hunted down a silent
    // driver-side regression in this loop (a join-against-previous +
    // count second pass per round; then a per-consumer plan re-walk
    // through the cached label tree). The convergence design is ONE
    // scalar aggregate per round (the monotone label-sum), one init
    // sum, and one eager localCheckpoint to cut the returned leaf.
    // Counting DISTINCT SQL execution ids (not jobs — AQE legitimately
    // splits one action into several jobs) pins that contract so a
    // refactor can't quietly reintroduce a second action per round.
    val pairs = Dedup.queries("q35_minhash_lsh")(spark, SparkSpec.Sf0001)
      .select("doc_a", "doc_b")
    val sym = pairs.union(pairs.select(
        org.apache.spark.sql.functions.col("doc_b"),
        org.apache.spark.sql.functions.col("doc_a")))
      .toDF("src", "dst")
    // Materialize the edge lineage OUTSIDE the counted window so the
    // candidate-generation actions don't pollute the count.
    val edges = sym.localCheckpoint(true)

    val (run, nActions) =
      graft.SqlActionCounter.countedSqlExecutions(spark) {
        Dedup.ccLabelsAuto(edges)
      }

    run.escalated shouldBe false // clique graph: hop loop converges
    // init label-sum + one label-sum per round + the eager leaf cut.
    nActions shouldBe (run.hopRounds + 2)
  }

  test("star CC clusters the real q35 dup graph identically to q56") {
    val pairs = Dedup.queries("q35_minhash_lsh")(spark, SparkSpec.Sf0001)
      .select("doc_a", "doc_b")
    val (labels, rounds) = Dedup.ccLabelsStar(pairs)
    val got = labels.groupBy(org.apache.spark.sql.functions.col("lbl"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.max("id").as("max_doc"),
        org.apache.spark.sql.functions.sum("id").as("sum_docs"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val q56 = Dedup.queries("q56_dedup_clusters")(spark, SparkSpec.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    got shouldBe q56
    rounds should be <= 6 // clique-shaped dup clusters converge fast
  }
}
