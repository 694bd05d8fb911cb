package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `graft.Train --eval` — the classifier-head scorecard (round-12
  * verdict task 6): the image-head twin of the oracled q209 holdout
  * scorecard, one TSV per head with the SAME card shape (per class:
  * support, correct, exact micro accuracy, worst/mean posterior), so
  * the trained centroid and logit heads are compared on the same
  * corpus with the same instrument. Reconciled against `LogitSpec`'s
  * fixtures: the planted-separable luminance bands (both heads must
  * read 100% with decisive posteriors) and a jittered overlapping-band
  * corpus where the card must agree EXACTLY with direct
  * `scoreFeatures` calls over the same files — the card is an
  * aggregate of the serving path, not a parallel implementation. */
class TrainEvalSpec extends AnyFunSuite with SparkSpec with Matchers {

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

  /** LogitSpec's planted-separable class tree: 3 luminance bands. */
  private def plantTree(bands: Seq[(String, Int)], jitters: Seq[Int],
      extraJitter: Int = 0): java.nio.file.Path = {
    val classDir = Files.createTempDirectory("traineval_classes_")
    for ((name, base) <- bands) {
      val d = Files.createDirectories(classDir.resolve(name))
      for (j <- jitters)
        Files.write(d.resolve(s"img$j.png"),
          png(base + j / 2, j + extraJitter))
    }
    classDir
  }

  private def readCard(path: java.nio.file.Path): Map[String, Seq[Long]] = {
    val lines = Files.readAllLines(path)
    lines.get(0) shouldBe Seq("label_idx", "label_name", "n_images",
      "n_correct", "acc_u", "conf_min_u", "conf_avg_u").mkString("\t")
    import scala.jdk.CollectionConverters._
    lines.asScala.drop(1).filter(_.nonEmpty).map { l =>
      val f = l.split("\t")
      f(1) -> Seq(f(0), f(2), f(3), f(4), f(5), f(6)).map(_.toLong)
    }.toMap
  }

  test("planted-separable bands: both heads score 100% with decisive " +
      "posteriors, on the same card") {
    val tree = plantTree(
      Seq("a_dark" -> 30, "b_mid" -> 128, "c_bright" -> 220),
      Seq(0, 4, 8, 12))
    val gcm = tree.resolve("m.gcm").toString
    val glm = tree.resolve("m.glm").toString
    graft.Train.run(Array(tree.toString, gcm), Some(spark)) shouldBe 0
    graft.Train.run(Array(tree.toString, glm, "--logit"),
      Some(spark)) shouldBe 0

    val cardC = tree.resolve("card_centroid.tsv")
    val cardL = tree.resolve("card_logit.tsv")
    graft.Train.run(Array("--eval", tree.toString, gcm, cardC.toString),
      Some(spark)) shouldBe 0
    graft.Train.run(Array("--eval", tree.toString, glm, cardL.toString),
      Some(spark)) shouldBe 0

    for ((card, minConf) <- Seq(readCard(cardC) -> 500000L,
        readCard(cardL) -> 600000L)) {
      card.keySet shouldBe Set("a_dark", "b_mid", "c_bright")
      card.values.foreach { v =>
        v(1) shouldBe 4L         // n_images
        v(2) shouldBe 4L         // n_correct
        v(3) shouldBe 1000000L   // acc_u
        v(4) should be > minConf // conf_min_u: decisive, not knife-edge
      }
    }
  }

  test("overlapping bands: each head's card reconciles EXACTLY with " +
      "direct scoreFeatures calls over the same files") {
    // bands 16 lumas apart with jitter up to 20: real cross-band bleed
    val tree = plantTree(
      Seq("a_low" -> 96, "b_high" -> 112),
      Seq(0, 4, 8, 12), extraJitter = 8)
    val gcm = tree.resolve("m.gcm").toString
    val glm = tree.resolve("m.glm").toString
    graft.Train.run(Array(tree.toString, gcm), Some(spark)) shouldBe 0
    graft.Train.run(Array(tree.toString, glm, "--logit"),
      Some(spark)) shouldBe 0

    val heads: Seq[(String, Array[Float] => (Int, Double))] = Seq(
      gcm -> CentroidModel.load(gcm).scoreFeatures _,
      glm -> LogitModel.load(glm).scoreFeatures _)
    val names = Seq("a_low", "b_high")
    for ((model, score) <- heads) {
      val out = Files.createTempFile("traineval_card_", ".tsv")
      Files.delete(out)
      graft.Train.run(Array("--eval", tree.toString, model, out.toString),
        Some(spark)) shouldBe 0
      val card = readCard(out)
      // expected counts from the SERVING scorer itself, file by file
      for ((name, idx) <- names.zipWithIndex) {
        val files = Files.list(tree.resolve(name)).iterator()
        import scala.jdk.CollectionConverters._
        val scoredRows = files.asScala.toSeq.map(p =>
          score(Media.imageFeatures(Files.readAllBytes(p))))
        val expCorrect = scoredRows.count(_._1 == idx).toLong
        val expMin = scoredRows
          .map(s => math.floor(s._2 * 1000000.0).toLong).min
        withClue(s"$model / $name: ") {
          card(name)(1) shouldBe scoredRows.size.toLong
          card(name)(2) shouldBe expCorrect
          card(name)(3) shouldBe (1000000L * expCorrect) / scoredRows.size
          card(name)(4) shouldBe expMin
        }
      }
    }
  }

  test("dictionary drift and unknown magics are refused loudly") {
    val tree = plantTree(Seq("a" -> 40, "b" -> 200), Seq(0, 4))
    val gcm = tree.resolve("m.gcm").toString
    graft.Train.run(Array(tree.toString, gcm), Some(spark)) shouldBe 0
    // a different class tree: same count, different names
    val other = plantTree(Seq("x" -> 40, "y" -> 200), Seq(0, 4))
    graft.Train.run(Array("--eval", other.toString, gcm,
      other.resolve("card.tsv").toString), Some(spark)) shouldBe 1
    // garbage artifact
    val junk = tree.resolve("junk.model")
    Files.writeString(junk, "not-a-model 1 2\n")
    graft.Train.run(Array("--eval", tree.toString, junk.toString,
      tree.resolve("card2.tsv").toString), Some(spark)) shouldBe 1
  }
}
