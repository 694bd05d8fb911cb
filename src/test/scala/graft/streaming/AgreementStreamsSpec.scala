package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.Similarity

/** The streaming kappa monitor must be exactly batch q186 over
  * everything seen: with the artifact frozen from the corpus' own
  * centroids, the final-boundary per-source snapshots are bit-equal to
  * q186's columns; a replayed batch id folds nothing; and a planted
  * label-flipped feed drives its κ to −1 mid-stream while a clean feed
  * holds at 1. */
class AgreementStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("final boundary bit-equal to batch q186; replay no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val (labels, cents, cn2, thr) = Similarity.confidentReference(spark, dir)
    val ref = NoiseStreams.NoiseRef(labels, cents, cn2, thr)

    // the batch join's frame: (source, label, embedding) per vector
    val rows = graft.Tables.embeddings(spark, dir)
      .join(graft.Tables.documents(spark, dir)
        .select($"doc_id".as("vec_id"), $"source"), "vec_id")
      .select("source", "label", "embedding")
      .as[(String, Int, Array[Float])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Int, Array[Float])]
    var last: Seq[AgreementStreams.KappaSnapshot] = Nil
    val q = AgreementStreams.monitor(
      mem.toDF().toDF("source", "label", "embedding"), ref,
      (s, _) => synchronized { last = s })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = SparkEntry.queries("q186_source_kappa")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val snaps = synchronized(last)
    snaps.map(_.source).toSet shouldBe batch.keySet
    snaps.foreach { s =>
      (s.n_vecs, s.agree, s.po_u, s.pe_u, s.kappa_u) shouldBe
        batch(s.source)
    }
  }

  test("replay folds nothing; a flipped feed reads κ=−1 mid-stream " +
      "while the clean feed holds κ=1") {
    // two separable classes, centroids frozen from them
    val dim = Similarity.Dim
    def v(c: Int): Array[Float] =
      (0 until dim).map(d => if (d / 6 == c) 1.0f else 0.0f).toArray
    def sv(c: Int): Array[Long] =
      v(c).map(x => math.floor(x * 10000.0).toLong)
    def n2(a: Array[Long]): Long = a.map(x => x * x).sum
    val ref = NoiseStreams.NoiseRef(Array(0, 1),
      Array(sv(0), sv(1)), Array(n2(sv(0)), n2(sv(1))), Array(0L, 0L))

    val fold = new AgreementStreams.KappaFold(ref)
    def batchOf(rows: Seq[(String, Int, Array[Float])]) = {
      val s = spark
      import s.implicits._
      rows.toDF("source", "label", "embedding")
    }
    val clean = Seq(("clean", 0, v(0)), ("clean", 0, v(0)),
      ("clean", 1, v(1)), ("clean", 1, v(1)))
    val flip = Seq(("flip", 1, v(0)), ("flip", 1, v(0)),
      ("flip", 0, v(1)), ("flip", 0, v(1)))
    val s1 = fold.fold(batchOf(clean), 0L)
    s1.map(s => s.source -> s.kappa_u).toMap shouldBe Map("clean" -> 1000000L)
    val s2 = fold.fold(batchOf(flip), 1L)
    s2.map(s => s.source -> s.kappa_u).toMap shouldBe
      Map("clean" -> 1000000L, "flip" -> -1000000L)
    // a replayed batch id folds nothing
    fold.fold(batchOf(flip), 1L) shouldBe s2
  }
}
