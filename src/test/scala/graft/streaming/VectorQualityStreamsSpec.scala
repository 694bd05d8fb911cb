package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** The streaming vector-quality monitor's five prefix-exact columns
  * (n/zero/min/max/avg) must equal batch q238 over everything seen —
  * pinned at every batch boundary on the real testdata embeddings,
  * plus a planted zero-vector burst that alarms mid-stream. */
class VectorQualityStreamsSpec extends AnyFunSuite with SparkSpec
    with Matchers {

  test("per-batch snapshots equal batch q238's prefix-exact columns " +
      "over everything seen; a planted zero-vector burst surfaces " +
      "immediately") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val all = graft.Tables.embeddings(spark, SparkSpec.Sf0001)
      .select("label", "embedding")
      .as[(Int, Array[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, Array[Float])]
    val latest = scala.collection.mutable.Map
      .empty[Int, VectorQualityStreams.QualitySnapshot]
    val q = VectorQualityStreams
      .quality(mem.toDF().toDF("label", "embedding"))
      .writeStream.outputMode("update")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[
            VectorQualityStreams.QualitySnapshot], _: Long) =>
          latest.synchronized {
            b.collect().foreach(s => latest(s.label) = s)
          }
      }.start()

    val fed = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Float])]
    try {
      all.grouped(all.size / 3 + 1).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        // batch replay over everything seen so far
        val dir = java.nio.file.Files
          .createTempDirectory("vq_replay_").toString
        fed.toSeq.toDF("label", "embedding")
          .withColumn("vec_id",
            org.apache.spark.sql.functions.monotonically_increasing_id())
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val batch = SparkEntry
          .queries("q238_embedding_quality")(spark, dir)
          .collect()
          .map(r => r.getInt(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5)))).toMap
        graft.operators.Features.clear(spark)
        latest.synchronized {
          batch.foreach { case (label, (n, z, mn, mx, avg)) =>
            val s = latest(label)
            (s.n_vecs, s.n_zero, s.min_n2, s.max_n2, s.avg_n2) shouldBe
              ((n, z, mn, mx, avg))
          }
        }
      }
      // zero-vector burst: three dead-encoder rows for label 0 alarm
      // in the NEXT batch's snapshot
      val before = latest.synchronized(latest(0).n_zero)
      mem.addData((1 to 3).map(_ => (0, Array.fill(64)(0.0f))))
      q.processAllAvailable()
      latest.synchronized {
        latest(0).n_zero shouldBe (before + 3)
        latest(0).min_n2 shouldBe 0L
      }
    } finally q.stop()
  }
}
