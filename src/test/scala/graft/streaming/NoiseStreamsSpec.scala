package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.Similarity

/** The streaming label-noise monitor must be exactly batch q175 over
  * everything seen: with the artifact frozen from the corpus' own
  * centroids/thresholds, every boundary equals a pure-Scala prefix
  * replay through the SAME scoring function, and the final boundary is
  * bit-equal to q175's per-class support/confident/noise columns. An
  * out-of-artifact label is counted, never dropped; a replayed batch
  * id folds nothing. */
class NoiseStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def refOf(dir: String): NoiseStreams.NoiseRef = {
    val (labels, cents, cn2, thr) =
      Similarity.confidentReference(spark, dir)
    NoiseStreams.NoiseRef(labels, cents, cn2, thr)
  }

  test("every boundary equals the prefix replay; final boundary is " +
      "bit-equal to batch q175") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val ref = refOf(dir)
    val rows = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Array[Float])]
    val snaps = scala.collection.mutable.ArrayBuffer
      .empty[NoiseStreams.NoiseSnapshot]
    val q = NoiseStreams.monitor(
      mem.toDF().toDF("vec_id", "label", "embedding"), ref,
      (s, _) => snaps.synchronized { snaps += s })

    // pure-Scala replay through the SAME scoring function
    def replay(prefix: Seq[(Long, Int, Array[Float])])
        : (Seq[Long], Seq[Long], Seq[Long]) = {
      val k = ref.labels.length
      val vecs = new Array[Long](k); val conf = new Array[Long](k)
      val noise = new Array[Long](k)
      prefix.foreach { case (_, given, emb) =>
        val g = ref.idxOf(given)
        vecs(g) += 1
        val pred = NoiseStreams.scoreOne(ref, emb)
        if (pred >= 0) {
          conf(g) += 1
          if (pred != given) noise(g) += 1
        }
      }
      (vecs.toSeq, conf.toSeq, noise.toSeq)
    }

    val fed = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Array[Float])]
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
        fed ++= chunk
        val (vecs, conf, noise) = replay(fed.toSeq)
        snaps.synchronized {
          val s = snaps.last
          s.n_rows shouldBe fed.size.toLong
          s.n_unknown shouldBe 0L
          s.n_vecs shouldBe vecs
          s.n_confident shouldBe conf
          s.n_noise shouldBe noise
        }
      }
    } finally q.stop()

    val batch = SparkEntry.queries("q175_label_noise")(spark, dir)
      .select("label", "n_vecs", "n_confident", "n_noise")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val s = snaps.synchronized(snaps.last)
    s.labels.toSet shouldBe batch.keySet
    s.labels.indices.foreach { i =>
      (s.n_vecs(i), s.n_confident(i), s.n_noise(i)) shouldBe
        batch(s.labels(i))
    }
  }

  test("out-of-artifact labels are counted, never dropped; a replayed " +
      "batch id folds nothing") {
    import spark.implicits._
    val dir = SparkSpec.Sf0001
    val ref = refOf(dir)
    val emb = graft.Tables.embeddings(spark, dir)
      .select("label", "embedding")
      .as[(Int, Array[Float])].head(3)

    val fold = new NoiseStreams.NoiseFold(ref)
    val b0 = Seq((emb(0)._1, emb(0)._2), (999, emb(1)._2))
      .toDF("label", "embedding")
    val s0 = fold.fold(b0, 0L)
    s0.n_rows shouldBe 2L
    s0.n_unknown shouldBe 1L // label 999 is not in the artifact

    // replaying batch 0 changes nothing
    fold.fold(b0, 0L) shouldBe s0
    // a NEW batch advances
    val b1 = Seq((emb(2)._1, emb(2)._2)).toDF("label", "embedding")
    val s1 = fold.fold(b1, 1L)
    s1.n_rows shouldBe 3L
    s1.n_unknown shouldBe 1L
  }

  test("a planted contradicting feed raises exactly its class' noise " +
      "count") {
    import spark.implicits._
    val dim = Similarity.Dim
    def v(cluster: Int): Array[Float] =
      (0 until dim).map(d => if (d / 6 == cluster) 1.0f else 0.02f).toArray
    // artifact: two tight classes
    val tmp = java.nio.file.Files.createTempDirectory("noise_s_").toString
    (0 until 10).map(i => (i.toLong, v(0), 0))
      .++((0 until 10).map(i => ((100 + i).toLong, v(1), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val ref = refOf(tmp)

    val fold = new NoiseStreams.NoiseFold(ref)
    // feed: 3 correct class-0 rows + 2 rows labeled 0 that sit on
    // class 1's centroid — confidently contradicted
    val feed = Seq((0, v(0)), (0, v(0)), (0, v(0)), (0, v(1)), (0, v(1)))
      .toDF("label", "embedding")
    val s = fold.fold(feed, 0L)
    val g0 = ref.idxOf(0)
    s.n_vecs(g0) shouldBe 5L
    s.n_noise(g0) shouldBe 2L
    s.n_unknown shouldBe 0L
  }
}
