package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q168 is a composition over the three retrievers' own outputs, so
  * the spec reconciles every metric against a driver-side replay of
  * the integer MRR/hit/precision arithmetic from those outputs plus
  * the label table — any drift between the eval and the retrievers it
  * scores fails here. Structural floors (mrr ≤ hit rate, dense
  * answers every query) are pinned too. */
class RetrievalEvalSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("metrics reconcile against a driver-side replay per retriever") {
    val dir = SparkSpec.Sf0001
    val NQ = 8L

    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap

    def replay(rows: Array[(Long, Long, Long)]): (Long, Long, Long, Long) = {
      // .toSeq BEFORE map: mapping a Map to pair tuples would rebuild
      // a Map keyed on the first element and silently dedupe queries
      val perQ = rows.groupBy(_._1).toSeq.map { case (q, rs) =>
        val rel = rs.filter(r => labels(r._2) == labels(q))
        (if (rel.isEmpty) None else Some(rel.map(_._3).min),
          rel.size.toLong)
      }
      val rrSum = perQ.flatMap(_._1).map(1000000L / _).sum
      val nHit = perQ.count(_._1.nonEmpty).toLong
      val relTot = perQ.map(_._2).sum
      (perQ.size.toLong, rrSum / NQ, 1000000L * nHit / NQ,
        1000000L * relTot / (5 * NQ))
    }

    def topOf(name: String, maxRank: Long): Array[(Long, Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .selectExpr("q_id", "vec_id", "CAST(rank AS BIGINT)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._3 <= maxRank)

    val expected = Map(
      "dense" -> replay(topOf("q38_cosine_topk", 5)),
      "lsh" -> replay(topOf("q39_lsh_ann", 5)),
      "ivf" -> replay(topOf("q44_ivf_ann", 5)))

    val got = SparkEntry.queries("q168_retrieval_eval")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    got.keySet shouldBe expected.keySet
    expected.foreach { case (name, (nAns, mrr, hit, prec)) =>
      withClue(s"$name: ") {
        got(name) shouldBe ((NQ, nAns, mrr, hit, prec))
        // structural floor: every reciprocal rank is <= 1, so the MRR
        // can never exceed the hit rate
        got(name)._3 should be <= got(name)._4
      }
    }
    // the exact retriever answers every query by construction
    got("dense")._2 shouldBe NQ
  }
}
