package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The streaming Misra–Gries tracker must honor the batch guarantee
  * OVER THE WHOLE STREAM: after any prefix of micro-batches, every
  * token whose total frequency across everything seen exceeds n/k is
  * among that source's candidates, with ≤ k−1 candidates and the exact
  * running token total — however the documents were split into batches.
  */
class HeavyHitterStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val K = 16

  /** Heavy token "hot" is ~25% of source s1's stream; 60 cold tokens
    * pad the vocabulary past k so the sketch must evict. s2 is uniform
    * (no hitter) — its candidates must never leak s1's counts. */
  private def docs: Seq[(String, String)] = {
    val s1 = (0 until 30).map { i =>
      val words = Seq("hot", s"cold${(i * 7) % 60}", "hot", s"cold${(i * 11) % 60}")
        .sortBy(w => (w.length * 31 + i) % 5)
      ("s1", words.mkString(" "))
    }
    val s2 = (0 until 30).map(i => ("s2", s"u${i % 20} u${(i + 7) % 20}"))
    (s1 ++ s2).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 60 }.map(_._1)
  }

  test("across micro-batches: capture guarantee holds on the running " +
      "union, candidate count stays bounded, totals are exact") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val memDocs = mem.toDF().toDF("source", "text")

    val latest = scala.collection.mutable.Map
      .empty[String, HeavyHitterStreams.HHSnapshot]
    val q = HeavyHitterStreams.heavyHitters(memDocs, K)
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[HeavyHitterStreams.HHSnapshot],
            _: Long) =>
          latest.synchronized {
            b.collect().foreach(s => latest(s.source) = s)
          }
      }.start()

    val chunks = docs.grouped(15).toSeq
    val fed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      chunks.foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        // exact ground truth over EVERYTHING seen so far
        val toks = fed.toSeq.flatMap { case (s, t) => t.split(" ").map((s, _)) }
        latest.synchronized {
          toks.groupBy(_._1).foreach { case (src, st) =>
            val snap = latest(src)
            snap.n_tokens shouldBe st.size.toLong // running total exact
            snap.candidates.size should be <= (K - 1)
            val exact = st.groupBy(_._2).view.mapValues(_.size.toLong)
            exact.foreach { case (w, c) =>
              if (c > st.size.toLong / K)
                withClue(s"$src/$w ($c of ${st.size}) after ${fed.size} docs:") {
                  snap.candidates should contain(w)
                }
            }
          }
        }
      }
    } finally q.stop()

    // the planted hitter is present at the end, and only for its source
    latest("s1").candidates should contain("hot")
    latest("s2").candidates should not contain "hot"
  }
}
