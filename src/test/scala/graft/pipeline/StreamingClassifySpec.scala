package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The reference's batch job as a continuous pipeline: `Infer.classify`
  * is source-agnostic (a `mapPartitions` over a typed Dataset), so the
  * SAME code that runs the batch manifest runs online inference on a
  * stream — swap `spark.read` for `readStream` and nothing else. Golden:
  * streaming output must equal the batch run over the same items. */
class StreamingClassifySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("Infer.classify on a stream equals the batch run (same scorer, same items)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val scorer = new HashScorer(labels.size)
    val items = (1 to 100).map(i => Item(s"/data/doc$i.jpg", s"document body $i")) :+
      Item("/data/blank.jpg", "   ") // sentinel path must work mid-stream too

    val batch = Infer.classify(items.toDS(), scorer, labels).collect()
      .map(p => (p.path, p.label, p.prob)).toSet

    val in = MemoryStream[Item]
    val q = Infer.classify(in.toDS(), scorer, labels)
      .writeStream.format("memory").queryName("online_preds")
      .outputMode(OutputMode.Append()).start()
    try {
      // Feed in two micro-batches to exercise repeated per-partition init.
      in.addData(items.take(40))
      q.processAllAvailable()
      in.addData(items.drop(40))
      q.processAllAvailable()
      val streamed = spark.table("online_preds").as[Prediction].collect()
        .map(p => (p.path, p.label, p.prob)).toSet
      streamed shouldBe batch
      streamed.find(_._1 == "/data/blank.jpg").get._3 shouldBe 0.0 // sentinel
    } finally q.stop()
  }

  test("the TRAINED model serves online through the same seam: streaming " +
      "CentroidScorer predictions equal the batch run, sentinel included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def png(luma: Int, jitter: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val c = (luma + (if ((x + y) % 2 == 0) jitter else -jitter))
          .max(0).min(255)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val model = CentroidModel.train(
      (for ((base, idx) <- Seq(30, 220).zipWithIndex; j <- Seq(0, 4, 8))
        yield (idx, Media.imageFeatures(png(base, j))))
        .toDF("label_idx", "features"))
    val dir = java.nio.file.Files.createTempDirectory("stream_cent_")
    def write(name: String, bytes: Array[Byte]): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, bytes)
      p.toString
    }
    val items = Seq("d.png" -> png(32, 2), "b.png" -> png(222, 2),
      "bad.png" -> Array[Byte](1, 2))
      .map { case (n, b) => write(n, b) }
      .map(p => Item(p, p))
    val labels = LabelDict(IndexedSeq("dark", "bright"))
    val scorer = new CentroidScorer(() => model)

    val batch = Infer.classify(items.toDS(), scorer, labels).collect()
      .map(p => (p.path, p.label, p.prob)).toSet
    val in = MemoryStream[Item]
    val q = Infer.classify(in.toDS(), scorer, labels)
      .writeStream.format("memory").queryName("online_centroid")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(items)
      q.processAllAvailable()
      val streamed = spark.table("online_centroid").as[Prediction].collect()
        .map(p => (p.path, p.label, p.prob)).toSet
      streamed shouldBe batch
      streamed.map(_._2) shouldBe Set("dark", "bright") // learned top-1s
      streamed.find(_._1.endsWith("bad.png")).get
        ._3 shouldBe 0.0 // M3 sentinel under the real model, mid-stream
    } finally q.stop()
  }
}
