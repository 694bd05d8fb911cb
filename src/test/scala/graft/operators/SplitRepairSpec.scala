package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions.{coalesce, col, greatest, least, lit}
import org.scalatest.Assertions.fail

import graft.{SparkEntry, SparkSpec}

/** q133 must CLOSE the leak q116 reports: after reassigning every
  * near-dup cluster member to its canonical member's split, no verified
  * near-dup pair may straddle the boundary, untouched documents keep
  * their q83 split, and the cross-tab accounts for every document. */
class SplitRepairSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** SplitLeakageSpec's planted corpus: a near-dup pair engineered to
    * straddle the split boundary, one exact duplicate, disjoint-vocab
    * fillers. */
  private def plantCorpus(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("repair_").toString
    val base = (0 until 100).map(i => s"tok${i % 83}z").mkString(" ")
    val baseSplit = Seq(base).toDF("text")
      .select(TextAnalysis.splitAssign.as("s")).as[String].head()
    val variants = (0 until 40).map(i => s"$base leak$i")
    val crosser = variants.toDF("text")
      .select(col("text"), TextAnalysis.splitAssign.as("s"))
      .as[(String, String)].collect()
      .find(_._2 != baseSplit).getOrElse(
        fail("no variant crossed the split boundary"))._1
    def doc(id: Long, text: String) =
      (id, text, "en", "src0", text.length.toLong)
    val fillers = (10 until 20).map(i =>
      doc(i.toLong, (0 until 40).map(j => s"f${i}w$j").mkString(" ")))
    (Seq(doc(0L, base), doc(1L, crosser), doc(2L, base)) ++ fillers)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** The repaired per-doc assignment, rebuilt exactly as q133 builds it
    * (canonical = CC label's own split) — the spec's probe for
    * re-running the q116 cross-tab on the REPAIRED splits. */
  private def repairedSplits(dir: String) = {
    val splits = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.splitAssign.as("split"))
    val labels = SparkEntry.queries("q56_dedup_clusters")(spark, dir)
      .select(col("cluster_id")) // forces the fixpoint; labels memoized
    labels.collect() // warm the cache so the probe below reads it
    val pairs = SparkEntry.queries("q35_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    // Recompute labels the oracle way for the probe: min reachable id.
    // (Tiny fixture — a few docs — so a driver-side closure is fine in
    // the TEST; the engine side under test uses the distributed CC.)
    val edges = pairs.collect().flatMap(r =>
      Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def component(start: Long): Set[Long] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val lbl = adj.keySet.map(id => id -> component(id).min).toMap
    val splitByDoc = splits.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    splitByDoc.map { case (id, s) =>
      id -> lbl.get(id).map(l => splitByDoc(l)).getOrElse(s)
    }
  }

  test("after repair every verified near-dup pair is same-split, and " +
      "the cross-tab accounts for every document") {
    import spark.implicits._
    val dir = plantCorpus()

    // Precondition: the planted leak is real (q116 reports cross rows).
    val leak = SparkEntry.queries("q116_split_leakage")(spark, dir)
      .filter(col("cross_split")).count()
    leak should be >= 1L

    val report = SparkEntry.queries("q133_split_repair")(spark, dir)
      .as[(String, String, Long, Boolean)].collect()

    // Accounting: cells partition the corpus (13 docs), moved flags
    // mark exactly the off-diagonal cells.
    report.map(_._3).sum shouldBe 13L
    report.foreach { case (o, n, _, moved) => moved shouldBe (o != n) }
    // The planted crosser moved: at least one off-diagonal doc.
    report.filter(_._4).map(_._3).sum should be >= 1L

    // The theorem q133 exists for: re-run the q116 cross-tab on the
    // REPAIRED assignment — zero cross-split pairs remain.
    val rep = repairedSplits(dir)
    val pairs = SparkEntry.queries("q35_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect()
    pairs should not be empty
    pairs.foreach { case (a, b) => rep(a) shouldBe rep(b) }
  }

  test("unclustered documents keep their q83 split (repair touches only " +
      "cluster members)") {
    val dir = plantCorpus()
    val report = SparkEntry.queries("q133_split_repair")(spark, dir)
    // Fillers (10 docs, disjoint vocab) are unclustered: their cells sit
    // on the diagonal. Clustered mass is docs 0/1/2 — at most 3 docs can
    // appear in moved cells.
    import spark.implicits._
    val moved = report.filter(col("moved")).as[(String, String, Long, Boolean)]
      .collect().map(_._3).sum
    moved should be <= 3L
  }
}
