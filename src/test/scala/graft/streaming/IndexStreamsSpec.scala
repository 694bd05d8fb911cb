package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.Similarity

/** Stream/batch parity and mid-stream alarm for the IVF cell-balance
  * monitor: the fixture corpus streamed in micro-batches against its
  * own frozen codebook must end at exactly batch q130's profile (same
  * assignment code path + exact integer state), and a concentrated
  * flood must drive its cell's load factor up at the boundary where it
  * arrives — the hot-cell signal forming mid-stream.
  */
class IndexStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  test("streamed corpus converges to exactly batch q130's profile, " +
      "pinned at every batch boundary over the seen prefix") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val embs = mem.toDF().toDF("vec_id", "embedding")

    val codebook = Similarity.ivfCodebook(spark, dir)
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, Long, Long, Long)])]
    val q = IndexStreams.cellBalanceMonitor(embs, codebook,
      IndexStreams.emptyState(codebook),
      (report, id) => perBatch.synchronized {
        perBatch += id -> report
          .select("cell", "n_vectors", "share_u", "load_u")
          .as[(Long, Long, Long, Long)].collect().toSeq
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    perBatch.size shouldBe 3
    // every boundary: counts sum to the seen prefix, all cells present
    val chunks = rows.grouped((rows.size + 2) / 3).map(_.size).toSeq
    perBatch.zipWithIndex.foreach { case ((_, rep), i) =>
      rep.map(_._2).sum shouldBe chunks.take(i + 1).sum
      rep.size shouldBe 10
    }
    // final boundary: exactly the batch q130 report
    val batch = SparkEntry.queries("q130_ivf_cell_profile")(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    perBatch.last._2.toSet shouldBe batch
  }

  test("a concentrated flood drives its cell's load factor up " +
      "mid-stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == axis) 1.0f else 0.0f)
    // frozen codebook from a balanced 4-label build (centroids derived
    // directly — the dir-bound q130 path doesn't apply to a fixture)
    val build = (0 until 20).map(i => (i.toLong, unit(i % 4), i % 4))
      .toDF("vec_id", "embedding", "label")
    val cb = {
      import org.apache.spark.sql.functions._
      val sv = graft.operators.Features.scaledEmbOver(build)
      sv.groupBy(col("label").as("c_label"))
        .agg(sum(element_at(col("sv"), 1)).as("c0"),
          (1 until 64).map(i => sum(element_at(col("sv"), i + 1)).as(s"c$i")): _*)
        .select(col("c_label"),
          array((0 until 64).map(i => col(s"c$i")): _*).as("cs"))
        .withColumn("cn2", graft.functions.VectorExprs.dotL(col("cs"), col("cs")))
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val embs = mem.toDF().toDF("vec_id", "embedding")
    val loads = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    val q = IndexStreams.cellBalanceMonitor(embs, cb,
      IndexStreams.emptyState(cb),
      (report, _) => loads.synchronized {
        loads += report.select("cell", "load_u")
          .as[(Long, Long)].collect().toMap
      })
    try {
      // batch 1: balanced traffic — loads near 10^6
      mem.addData((100 until 120).map(i => (i.toLong, unit(i % 4).toSeq)))
      q.processAllAvailable()
      // batch 2: a flood into cell 0's direction
      mem.addData((200 until 260).map(i => (i.toLong, unit(0).toSeq)))
      q.processAllAvailable()
    } finally q.stop()

    loads.size shouldBe 2
    loads(0)(0L) shouldBe 1000000L  // balanced: exactly the ideal
    loads(1)(0L) should be > 2000000L // the flood: hot cell visible
    loads(1)(1L) should be < 1000000L // others diluted
  }

  test("a replayed batchId cannot double-count; a snapshot restore " +
      "resumes the exact state") {
    val cc = new IndexStreams.CellCounts(Seq(0L, 1L))
    cc.add(0L, Seq(0L -> 5L, 1L -> 3L)) shouldBe true
    cc.add(0L, Seq(0L -> 5L, 1L -> 3L)) shouldBe false // at-least-once replay
    cc.add(1L, Seq(0L -> 2L)) shouldBe true
    cc.snapshot shouldBe ((1L, Seq(0L -> 7L, 1L -> 3L)))

    val restored = IndexStreams.CellCounts.restore(cc.snapshot)
    restored.snapshot shouldBe cc.snapshot
    // the restored state keeps rejecting replays of its last batch
    restored.add(1L, Seq(0L -> 2L)) shouldBe false
    restored.add(2L, Seq(1L -> 1L)) shouldBe true
    restored.snapshot shouldBe ((2L, Seq(0L -> 7L, 1L -> 4L)))
  }
}
