package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[LogitModel]]: the multinomial-logistic upgrade must keep the
  * CentroidModel contract — byte-deterministic checkpoints under any
  * partitioning, perfect separation of planted luminance bands from
  * real decoded pixels, loud rejection of malformed rows and class
  * gaps — and must LEARN something nearest-centroid structurally
  * cannot: a class pair separated by which bins matter, not by where
  * the mean sits. Serving rides the Scorer seam with the M3 sentinel
  * intact. */
class LogitSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def png(luma: Int, jitter: Int = 0, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val c = (luma + (if ((x + y) % 2 == 0) jitter else -jitter))
        .max(0).min(255)
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def trainingImages: Seq[(Int, Array[Byte])] =
    for {
      (base, idx) <- Seq(30, 128, 220).zipWithIndex
      j <- Seq(0, 4, 8, 12)
    } yield (idx, png(base + j / 2, j))

  private def trainedModel(partitions: Int): LogitModel = {
    import spark.implicits._
    LogitModel.trainOnImages(
      trainingImages.toDF("label_idx", "content").repartition(partitions))
  }

  test("training is byte-deterministic and partition-order invariant") {
    val m7 = trainedModel(7)
    val m3 = trainedModel(3)
    m7.weights.map(_.toSeq) shouldBe m3.weights.map(_.toSeq)
    val d = Files.createTempDirectory("logit_det_")
    val (p7, p3) = (d.resolve("m7.glm"), d.resolve("m3.glm"))
    m7.save(p7.toString)
    m3.save(p3.toString)
    Files.readAllBytes(p7).toSeq shouldBe Files.readAllBytes(p3).toSeq
    val back = LogitModel.load(p7.toString)
    back.weights.map(_.toSeq) shouldBe m7.weights.map(_.toSeq)
    back.labels shouldBe m7.labels
  }

  test("planted separable luminance bands: held-out images classify " +
      "correctly with decisive softmax posteriors") {
    val m = trainedModel(5)
    m.numClasses shouldBe 3
    m.dim shouldBe Media.FeatureDim
    for ((base, expected) <- Seq(30 -> 0, 128 -> 1, 220 -> 2)) {
      val (idx, prob) = m.scoreFeatures(Media.imageFeatures(png(base + 3, 2)))
      idx shouldBe expected
      prob should be > 0.6
    }
  }

  test("logit learns a WEIGHTED boundary nearest-centroid structurally " +
      "cannot: equal-mean classes separated by one informative bin") {
    import spark.implicits._
    // Class 0 splits its mass between bins 0 and 2; class 1 puts the
    // same total mass at bin 1 plus the same bins-0/2 background. The
    // class MEANS sit close (identical background mass drags both),
    // but bin 1 alone decides membership — a weight on bin 1 solves
    // it; plant enough asymmetry that the centroid margin is thin
    // while logit's posterior is decisive.
    def f(bin1: Float): Array[Float] = {
      val a = Array.fill(Media.FeatureDim)(0.0f)
      a(0) = (1.0f - bin1) / 2; a(2) = (1.0f - bin1) / 2; a(1) = bin1
      a
    }
    val rows = (0 until 8).map(i => (0, f(0.02f + 0.005f * (i % 3)))) ++
      (0 until 8).map(i => (1, f(0.30f + 0.005f * (i % 3))))
    val m = LogitModel.train(rows.toDF("label_idx", "features"))
    // perfect training separation with calibrated confidence
    rows.foreach { case (y, feat) =>
      val (idx, p) = m.scoreFeatures(feat)
      idx shouldBe y
      p should be > 0.5
    }
    // the learned boundary generalizes along the informative axis
    m.scoreFeatures(f(0.01f))._1 shouldBe 0
    m.scoreFeatures(f(0.40f))._1 shouldBe 1
  }

  test("malformed rows and class gaps are rejected loudly") {
    import spark.implicits._
    val good = (0 until 4).map(i => (i % 2, Array.fill(16)(0.0625f)))
    val short = Seq((1, Array.fill(9)(0.5f)))
    val e = intercept[Exception] {
      LogitModel.train((good ++ short).toDF("label_idx", "features"), 16)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    msgs should include("!= 16")
    val gap = Seq((0, Array.fill(16)(0.0625f)), (2, Array.fill(16)(0.0625f)))
    val eg = intercept[IllegalArgumentException] {
      LogitModel.train(gap.toDF("label_idx", "features"), 16)
    }
    eg.getMessage should include("contiguous")
  }

  test("CLI round trip: graft.Train --logit learns from the class tree " +
      "and graft.Main --logit serves it; --update is refused (GD is " +
      "not a monoid); dictionary drift is refused") {
    import scala.jdk.CollectionConverters._
    val classDir = Files.createTempDirectory("logit_classes_")
    for ((name, base) <- Seq("a_dark" -> 30, "b_mid" -> 128,
        "c_bright" -> 220)) {
      val d = Files.createDirectories(classDir.resolve(name))
      for (j <- Seq(0, 4, 8, 12))
        Files.write(d.resolve(s"img$j.png"), png(base + j / 2, j))
    }
    val model = classDir.resolve("model.glm")
    graft.Train.run(Array(classDir.toString, model.toString, "--logit"),
      Some(spark)) shouldBe 0
    val trained = LogitModel.load(model.toString)
    trained.labels shouldBe IndexedSeq("a_dark", "b_mid", "c_bright")

    val servDir = Files.createTempDirectory("logit_serve_")
    val paths = Seq("a_dark" -> 31, "b_mid" -> 129, "c_bright" -> 221).map {
      case (cls, luma) =>
        val p = servDir.resolve(s"$cls.png")
        Files.write(p, png(luma, 2))
        cls -> p.toString
    }
    val corrupt = servDir.resolve("corrupt.png")
    Files.write(corrupt, Array[Byte](0, 1, 2))
    val manifest = servDir.resolve("manifest.txt")
    Files.writeString(manifest,
      (paths.map(_._2) :+ corrupt.toString).mkString("\n"))
    val out = servDir.resolve("out")
    graft.Main.run(Array(manifest.toString, out.toString,
      "--logit", model.toString, "--single-file"), Some(spark)) shouldBe 0
    val rows = Files.list(out).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .map { l => val Array(p, lp) = l.split("\t"); p -> lp }
      .toMap
    for ((cls, p) <- paths) rows(p) should startWith(s"$cls,")
    rows(corrupt.toString) shouldBe "a_dark,0.0000" // M3 sentinel, %.4f

    // --update with --logit is a stated usage error
    graft.Train.run(Array(classDir.toString,
      classDir.resolve("m2.glm").toString, "--logit",
      "--update", model.toString), Some(spark)) shouldBe 1
    // a mismatched --labels dictionary is refused, never remapped
    graft.Main.run(Array(manifest.toString,
      servDir.resolve("out2").toString, "--logit", model.toString,
      "--labels", servDir.toString), Some(spark)) shouldBe 1
  }

  test("train -> ship -> serve: the artifact rides addFile/SparkFiles, " +
      "serves learned top-1 through Infer, corrupt payloads land on " +
      "the M3 sentinel") {
    import spark.implicits._
    val m = trainedModel(4)
    val dir = Files.createTempDirectory("logit_ship_")
    val modelPath = dir.resolve(s"logit_${System.nanoTime()}.glm")
    m.save(modelPath.toString)
    spark.sparkContext.addFile(modelPath.toString)

    // one readable image file per class + one corrupt path
    val imgs = Seq(30 -> 0, 128 -> 1, 220 -> 2).map { case (base, idx) =>
      val p = dir.resolve(s"img_$base.png")
      Files.write(p, png(base + 1, 1))
      (p.toString, idx)
    }
    val items = imgs.map(_._1) :+ dir.resolve("missing.png").toString
    val labels = LabelDict(IndexedSeq("dark", "mid", "bright"))
    val scored = Infer.classify(
      spark.createDataset(items).map(p => Item(p, p)),
      new LogitScorer(modelPath.getFileName.toString), labels, 2)
      .collect().map(p => p.path -> p.label).toMap
    imgs.foreach { case (p, idx) =>
      scored(p) shouldBe labels(idx)
    }
    // M3 sentinel: unreadable payload scores (labels(0), 0.0)
    scored(items.last) shouldBe labels(0)
  }
}
