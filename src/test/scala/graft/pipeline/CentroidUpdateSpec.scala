package graft.pipeline

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Incremental training (`graft.Train --update`): the v2 checkpoint
  * carries the exact training monoid, so folding an update batch in
  * must produce the BYTE-IDENTICAL artifact a from-scratch run over
  * the union would — including when the update batch carries nothing
  * for some class. Dictionary drift and v1 means-only artifacts are
  * rejected loudly. */
class CentroidUpdateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def png(luma: Int, jitter: Int): Array[Byte] = {
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

  private val Classes = Seq("a_dark" -> 30, "b_mid" -> 128, "c_bright" -> 220)

  /** A class tree holding the given (class → jitter seeds); every class
    * folder exists even when empty (the dictionary is the tree). */
  private def tree(root: Path, images: Map[String, Seq[Int]]): Path = {
    for ((name, base) <- Classes) {
      val d = Files.createDirectories(root.resolve(name))
      for (j <- images.getOrElse(name, Nil))
        Files.write(d.resolve(s"img$j.png"), png(base + j / 2, j))
    }
    root
  }

  test("update == from-scratch over the union, byte-identically — even " +
      "with a class the update batch left empty; v2 serves directly") {
    val root = Files.createTempDirectory("cupd_")
    val batchA = Map("a_dark" -> Seq(0, 4), "b_mid" -> Seq(0, 4, 8),
      "c_bright" -> Seq(0, 4))
    val batchB = Map("a_dark" -> Seq(8, 12), "b_mid" -> Seq(12))
    // c_bright gets NOTHING in batch B — its sums must pass through.
    val union = batchA.keySet.union(batchB.keySet).map(k =>
      k -> (batchA.getOrElse(k, Nil) ++ batchB.getOrElse(k, Nil))).toMap

    val treeA = tree(Files.createDirectories(root.resolve("A")), batchA)
    val treeB = tree(Files.createDirectories(root.resolve("B")), batchB)
    val treeU = tree(Files.createDirectories(root.resolve("U")), union)

    val outA = root.resolve("a.gcm").toString
    val outAB = root.resolve("ab.gcm").toString
    val outU = root.resolve("u.gcm").toString
    graft.Train.run(Array(treeA.toString, outA), Some(spark)) shouldBe 0
    graft.Train.run(Array(treeB.toString, outAB, "--update", outA),
      Some(spark)) shouldBe 0
    graft.Train.run(Array(treeU.toString, outU), Some(spark)) shouldBe 0

    Files.readAllBytes(java.nio.file.Paths.get(outAB)).toSeq shouldBe
      Files.readAllBytes(java.nio.file.Paths.get(outU)).toSeq

    // the v2 artifact serves through the normal load path
    val served = CentroidModel.load(outAB)
    served.numClasses shouldBe 3
    served.centroids.map(_.toSeq) shouldBe
      CentroidSums.load(outAB).toModel.centroids.map(_.toSeq)
  }

  test("dictionary drift and v1 artifacts are rejected loudly; --update " +
      "without a value is a usage error") {
    val root = Files.createTempDirectory("cupd_bad_")
    val treeA = tree(Files.createDirectories(root.resolve("A")),
      Map("a_dark" -> Seq(0), "b_mid" -> Seq(0), "c_bright" -> Seq(0)))
    val outA = root.resolve("a.gcm").toString
    graft.Train.run(Array(treeA.toString, outA), Some(spark)) shouldBe 0

    // a tree with an extra class = a different dictionary
    val drifted = Files.createDirectories(root.resolve("D"))
    tree(drifted, Map("a_dark" -> Seq(0), "b_mid" -> Seq(0),
      "c_bright" -> Seq(0)))
    Files.write(Files.createDirectories(drifted.resolve("z_new"))
      .resolve("img0.png"), png(90, 0))
    graft.Train.run(Array(drifted.toString,
      root.resolve("d.gcm").toString, "--update", outA),
      Some(spark)) shouldBe 1

    // a v1 means-only artifact cannot be updated
    val v1 = root.resolve("v1.gcm").toString
    CentroidSums.load(outA).toModel.save(v1)
    graft.Train.run(Array(treeA.toString,
      root.resolve("x.gcm").toString, "--update", v1),
      Some(spark)) shouldBe 1

    graft.Train.run(Array(treeA.toString,
      root.resolve("y.gcm").toString, "--update"), Some(spark)) shouldBe 1
  }

  test("a dimensionality-mismatched update is rejected loudly, never " +
      "silently truncated or padded") {
    val sums = CentroidSums(IndexedSeq("a", "b"),
      Map(0 -> ((2L, Array.fill(16)(5L))), 1 -> ((2L, Array.fill(16)(7L)))))
    val e = intercept[IllegalArgumentException] {
      sums.merge(Map(0 -> ((1L, Array.fill(8)(3L)))))
    }
    e.getMessage should include("dimensionality")
    // equal dims still merge exactly
    sums.merge(Map(0 -> ((1L, Array.fill(16)(1L)))))
      .byIdx(0) match {
      case (n, arr) =>
        n shouldBe 3L
        arr.toSeq shouldBe Seq.fill(16)(6L)
    }
  }
}
