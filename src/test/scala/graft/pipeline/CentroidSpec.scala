package graft.pipeline

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** M2/M4 closed: the REAL trained model. Training must be deterministic
  * (byte-identical checkpoints across partitionings), planted separable
  * classes must classify correctly with a real margin, the artifact must
  * ship through the `sc.addFile` → `SparkFiles` path and serve on
  * executors, and the corrupt-image sentinel must survive under the
  * learned model — the reference pipeline's serving policy
  * (`/root/reference/python/predict_batch_threaded_local.py:100-118`)
  * with actual learned weights instead of the hash stand-in. */
class CentroidSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** A flat gray PNG at `luma` with a ±`jitter` checkerboard — three
    * well-separated luminance bands make three linearly separable
    * histogram classes. */
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

  // class 0 = dark, 1 = mid, 2 = bright; 4 training images each
  private def trainingImages: Seq[(Int, Array[Byte])] =
    for {
      (base, idx) <- Seq(30, 128, 220).zipWithIndex
      j <- Seq(0, 4, 8, 12)
    } yield (idx, png(base + j / 2, j))

  private def trainedModel(partitions: Int): CentroidModel = {
    import spark.implicits._
    CentroidModel.trainOnImages(
      trainingImages.toDF("label_idx", "content").repartition(partitions))
  }

  test("training is deterministic and partition-order invariant: " +
      "byte-identical checkpoints from different partitionings") {
    val m7 = trainedModel(7)
    val m3 = trainedModel(3)
    m7.centroids.map(_.toSeq) shouldBe m3.centroids.map(_.toSeq)
    val d = Files.createTempDirectory("centroid_det_")
    val (p7, p3) = (d.resolve("m7.gcm"), d.resolve("m3.gcm"))
    m7.save(p7.toString)
    m3.save(p3.toString)
    Files.readAllBytes(p7).toSeq shouldBe Files.readAllBytes(p3).toSeq
    // and the artifact round-trips exactly
    CentroidModel.load(p7.toString).centroids.map(_.toSeq) shouldBe
      m7.centroids.map(_.toSeq)
  }

  test("a malformed feature row (length != dim, or null) is rejected " +
      "loudly, not silently sum-skipped into a corrupt centroid") {
    import spark.implicits._
    val good = (0 until 3).map(i => (i % 2, Array.fill(16)(0.5f)))
    // one short row: element_at past its end yields null, which sum()
    // would silently skip — the guard must catch it instead
    val short = Seq((1, Array.fill(9)(0.5f)))
    val e = intercept[IllegalArgumentException] {
      CentroidModel.train((good ++ short).toDF("label_idx", "features"), 16)
    }
    e.getMessage should include("!= 16")
    e.getMessage should include("1:1") // per-class detail: class 1, 1 row
    val eNull = intercept[IllegalArgumentException] {
      CentroidModel.train(
        (good :+ ((0, null.asInstanceOf[Array[Float]])))
          .toDF("label_idx", "features"), 16)
    }
    eNull.getMessage should include("!= 16")
    // exact-length rows still train fine (the guard is not over-eager)
    CentroidModel.train(good.toDF("label_idx", "features"), 16)
      .numClasses shouldBe 2
  }

  test("planted separable classes: held-out images classify to their " +
      "class with a real margin; training actually learned from pixels") {
    val m = trainedModel(5)
    m.numClasses shouldBe 3
    m.dim shouldBe Media.FeatureDim
    // held-out: same bands, different jitter than any training image
    for ((base, expected) <- Seq(30 -> 0, 128 -> 1, 220 -> 2)) {
      val (idx, prob) = m.scoreFeatures(Media.imageFeatures(png(base + 3, 2)))
      idx shouldBe expected
      prob should be > 0.6 // separable bands ⇒ decisive margin
    }
    // an in-band flat image is near-certain, never exactly tied
    val (_, pTop) = m.scoreFeatures(Media.imageFeatures(png(30)))
    pTop should be > 0.8
  }

  test("non-contiguous class indices are rejected loudly: a class with " +
      "no decodable training data must not ship silently") {
    import spark.implicits._
    val gap = Seq((0, png(30)), (2, png(220)))
      .toDF("label_idx", "content")
    val e = intercept[IllegalArgumentException] {
      CentroidModel.trainOnImages(gap)
    }
    e.getMessage should include("contiguous")
    // undecodable training images are skipped and counted, not scored
    val acc = spark.sparkContext.longAccumulator("skip_test")
    val withCorrupt = Seq((0, png(30)), (0, Array[Byte](1, 2, 3)),
      (1, png(220))).toDF("label_idx", "content")
    CentroidModel.trainOnImages(withCorrupt, Some(acc)).numClasses shouldBe 2
    acc.value shouldBe 1L
  }

  test("train -> ship -> serve: the saved checkpoint rides addFile/" +
      "SparkFiles to executors, serves learned top-1, and preserves the " +
      "corrupt-image sentinel") {
    import spark.implicits._
    val m = trainedModel(4)
    val dir = Files.createTempDirectory("centroid_ship_")
    val modelPath = dir.resolve(s"model_${System.nanoTime()}.gcm")
    m.save(modelPath.toString)

    // held-out images ON DISK — payloads are paths, the reference
    // mapper's manifest-line contract
    def write(name: String, bytes: Array[Byte]): String = {
      val p = dir.resolve(name)
      Files.write(p, bytes)
      p.toString
    }
    val items = Seq("dark" -> png(33, 2), "mid" -> png(131, 2),
      "bright" -> png(223, 2))
      .map { case (n, b) => write(s"$n.png", b) }
      .map(p => Item(p, p)) // payload = path, the mapper-line contract
    val corrupt = write("corrupt.png", Array[Byte](9, 9, 9))
    val all = items :+ Item(corrupt, corrupt)

    spark.sparkContext.addFile(modelPath.toString)
    val labels = LabelDict(IndexedSeq("dark", "mid", "bright"))
    val sentinels = spark.sparkContext.longAccumulator("centroid_sentinels")
    val preds = Infer.classify(all.toDS(), new CentroidScorer(modelPath
      .getFileName.toString), labels, sentinels = Some(sentinels))
      .collect().map(p => p.path -> ((p.label, p.prob))).toMap

    preds(items(0).path)._1 shouldBe "dark"
    preds(items(1).path)._1 shouldBe "mid"
    preds(items(2).path)._1 shouldBe "bright"
    // executor-side scores equal the driver-side model exactly
    for (it <- items) {
      val (idx, prob) = m.scoreFeatures(
        Media.imageFeatures(Files.readAllBytes(java.nio.file.Paths.get(it.path))))
      preds(it.path) shouldBe ((labels(idx), prob))
    }
    // M3 sentinel under the REAL model: undecodable → (labels(0), 0.0)
    preds(corrupt) shouldBe (("dark", 0.0))
    sentinels.value shouldBe 1L
  }

  private def writeClassDir(): Path = {
    val root = Files.createTempDirectory("centroid_classes_")
    for ((name, base) <- Seq("a_dark" -> 30, "b_mid" -> 128, "c_bright" -> 220)) {
      val d = Files.createDirectories(root.resolve(name))
      for (j <- Seq(0, 4, 8, 12))
        Files.write(d.resolve(s"img$j.png"), png(base + j / 2, j))
    }
    root
  }

  test("CLI round trip: graft.Train learns from a class-folder tree and " +
      "graft.Main --centroid serves it — train and serve share the " +
      "sorted-subdir label dictionary") {
    val classDir = writeClassDir()
    val model = classDir.resolve("model.gcm")
    graft.Train.run(Array(classDir.toString, model.toString),
      Some(spark)) shouldBe 0

    // the trained dictionary order is the sorted subdir order
    val trained = CentroidModel.load(model.toString)
    trained.numClasses shouldBe 3

    // manifest of held-out images, one per class, plus a corrupt one
    val servDir = Files.createTempDirectory("centroid_serve_")
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
      "--centroid", model.toString, "--labels", classDir.toString,
      "--single-file"), Some(spark)) shouldBe 0

    val rows = Files.list(out).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .map { l => val Array(p, lp) = l.split("\t"); p -> lp }
      .toMap
    for ((cls, p) <- paths) rows(p) should startWith(s"$cls,")
    rows(corrupt.toString) shouldBe "a_dark,0.0000" // M3 sentinel, %.4f

    // re-train refuses to clobber the artifact; bad usage refuses to run
    graft.Train.run(Array(classDir.toString, model.toString),
      Some(spark)) shouldBe 1
    graft.Train.run(Array(classDir.toString), Some(spark)) shouldBe 1
  }

  test("--centroid dictionary safety: the v2 artifact's pinned names " +
      "serve by default; a mismatched --labels and an undersized " +
      "default dictionary are refused, never silently remapped") {
    val classDir = writeClassDir()
    val model = classDir.resolve("safety.gcm")
    graft.Train.run(Array(classDir.toString, model.toString),
      Some(spark)) shouldBe 0

    val servDir = Files.createTempDirectory("centroid_dict_")
    val img = servDir.resolve("probe.png")
    Files.write(img, png(31, 2))
    val manifest = servDir.resolve("m.txt")
    Files.writeString(manifest, img.toString)

    // no --labels: the artifact IS the dictionary
    val out1 = servDir.resolve("out1")
    graft.Main.run(Array(manifest.toString, out1.toString,
      "--centroid", model.toString, "--single-file"),
      Some(spark)) shouldBe 0
    Files.list(out1).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(f => Files.readAllLines(f).asScala)
      .head should include("\ta_dark,")

    // --labels naming a different dictionary: refused loudly
    val otherTree = Files.createTempDirectory("centroid_other_")
    for (n <- Seq("x", "y", "z"))
      Files.createDirectories(otherTree.resolve(n))
    graft.Main.run(Array(manifest.toString,
      servDir.resolve("out2").toString, "--centroid", model.toString,
      "--labels", otherTree.toString), Some(spark)) shouldBe 1

    // a v1 artifact (no pinned names) against the default 30-class
    // dictionary: class-count mismatch is refused, not fallback-mapped
    val v1 = servDir.resolve("v1.gcm")
    CentroidModel.load(model.toString).save(v1.toString)
    graft.Main.run(Array(manifest.toString,
      servDir.resolve("out3").toString, "--centroid", v1.toString),
      Some(spark)) shouldBe 1
  }
}
