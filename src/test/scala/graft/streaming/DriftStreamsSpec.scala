package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The streaming drift monitor must be exactly the batch computation
  * over everything seen: after every micro-batch, each source's
  * emitted drift equals q100's floor-mean cosine replayed over the
  * union of all batches so far (exact int64 state ⇒ bit-identical,
  * not approximately equal) — and a planted mis-encoded feed trips
  * the alarm while healthy feeds stay aligned.
  */
class DriftStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Reference direction: +e0 dominant, small positive tail. */
  private val ref: Array[Long] =
    Array.tabulate(64)(j => if (j == 0) 10000L else 200L)

  /** s0/s1 aligned with ref (with per-vector jitter); s2 negated —
    * the feed whose encoder changed. */
  private def vecs: Seq[(String, Array[Float])] =
    (0 until 90).map { i =>
      val src = s"s${i % 3}"
      val sign = if (i % 3 == 2) -1.0f else 1.0f
      val emb = Array.tabulate(64) { j =>
        val jitter = (((i * 31 + j * 17) % 97) - 48) / 1000.0f
        sign * (if (j == 0) 1.0f else 0.02f) + jitter
      }
      (src, emb)
    }

  test("per-batch drift equals the batch replay over everything seen, " +
      "and the mis-encoded feed alarms") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Array[Float])]
    val memVecs = mem.toDF().toDF("source", "embedding")

    val latest = scala.collection.mutable.Map
      .empty[String, DriftStreams.DriftSnapshot]
    val q = DriftStreams.drift(memVecs, ref)
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[DriftStreams.DriftSnapshot],
            _: Long) =>
          latest.synchronized {
            b.collect().foreach(s => latest(s.source) = s)
          }
      }.start()

    val fed = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Float])]
    try {
      vecs.grouped(30).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        // batch replay: exact sums over the union of all batches so far
        latest.synchronized {
          fed.groupBy(_._1).foreach { case (src, rows) =>
            val sums = new Array[Long](64)
            rows.foreach { case (_, v) =>
              val sv = DriftStreams.scale(v)
              (0 until 64).foreach(i => sums(i) += sv(i))
            }
            val snap = latest(src)
            snap.n_vecs shouldBe rows.size.toLong
            snap.drift_u shouldBe
              DriftStreams.driftU(sums, rows.size.toLong, ref)
          }
        }
      }
    } finally q.stop()

    // alarm semantics on the final state
    latest("s0").drift_u should be > 800000L
    latest("s1").drift_u should be > 800000L
    latest("s2").drift_u should be < -800000L
  }

  test("referenceMean reproduces the exact floor-mean direction") {
    import spark.implicits._
    val df = vecs.filter(_._1 != "s2").map(_._2).toSeq
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = DriftStreams.referenceMean(df)
    val rows = vecs.filter(_._1 != "s2").map(_._2)
    val sums = new Array[Long](64)
    rows.foreach { v =>
      val sv = DriftStreams.scale(v)
      (0 until 64).foreach(i => sums(i) += sv(i))
    }
    got.toSeq shouldBe sums.map(s => Math.floorDiv(s, rows.size.toLong)).toSeq
  }

  test("referenceMean on an empty reference corpus is a clear contract " +
      "error, not an opaque reduce failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      DriftStreams.referenceMean(empty)
    }
    e.getMessage should include("empty")
  }
}
