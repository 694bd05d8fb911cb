package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The perceptual hash must read coarse image structure, not bytes:
  * the same scene survives lossy JPEG re-encoding and resizing within
  * a small Hamming distance while a different scene lands far away;
  * the banded near-dup join finds exactly the within-threshold pairs
  * (the b-band pigeonhole guarantee is exact, not probabilistic); and
  * undecodable payloads drop silently from the pair scan. */
class PhashSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** A scene with a full low-frequency spectrum (1/f-decaying
    * amplitudes, seed-dependent signs): every retained DCT coefficient
    * is significantly nonzero, the property of natural images that
    * makes pHash stable under re-encoding — a spectrally sparse
    * synthetic gradient would leave most coefficients at the median,
    * where JPEG noise flips bits freely. */
  private def scene(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def amp(u: Int, v: Int): Double =
      (if (graft.pipeline.HashScorer.md5u32(s"$seed:$u:$v") % 2 == 0) 1.0
       else -1.0) * 60.0 / (1.0 + u + v)
    for (y <- 0 until h; x <- 0 until w) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8; if u + v > 0)
        s += amp(u, v) *
          math.cos(math.Pi * u * (y + 0.5) / h) *
          math.cos(math.Pi * v * (x + 0.5) / w)
      val c = (128 + s).toInt.max(0).min(255)
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("re-encoding and resizing stay near; a different scene lands far") {
    val pngA = encode(scene(128, 96, 0), "png")
    val jpgA = encode(scene(128, 96, 0), "jpg")
    val smallA = encode(scene(64, 48, 0), "png")
    val pngB = encode(scene(128, 96, 1), "png")

    val ha = Media.phash(pngA)
    Media.hamming64(ha, Media.phash(jpgA)) should be <= 6
    Media.hamming64(ha, Media.phash(smallA)) should be <= 6
    Media.hamming64(ha, Media.phash(pngB)) should be >= 16
    // identical bytes ⇒ identical hash
    Media.phash(pngA) shouldBe Media.phash(encode(scene(128, 96, 0), "png"))
  }

  test("banded near-dup join finds the within-threshold pairs and " +
      "drops undecodable payloads") {
    import spark.implicits._
    val objs = Seq(
      Media.MediaObject("a_png", "image", encode(scene(128, 96, 0), "png")),
      Media.MediaObject("a_copy", "image", encode(scene(128, 96, 0), "png")),
      Media.MediaObject("b_png", "image", encode(scene(128, 96, 1), "png")),
      Media.MediaObject("c_png", "image", encode(scene(128, 96, 2), "png")),
      Media.MediaObject("junk", "image", Array[Byte](1, 2, 3))).toDS()

    val pairs = Media.imageNearDupPairs(objs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    pairs.map(p => (p._1, p._2)) shouldBe Array(("a_copy", "a_png"))
    pairs.head._3 shouldBe 0L
  }

  test("the pigeonhole guarantee: any pair within Hamming b-1 shares " +
      "a clean band") {
    // Pure hash-level property over adversarial bit flips: flip
    // exactly PhashMaxHamming bits spread maximally across bands.
    val base = 0x0123456789abcdefL
    val bandBits = 64 / Media.PhashBands
    val flipped = (0 until Media.PhashMaxHamming)
      .foldLeft(base)((h, i) => h ^ (1L << (i * bandBits)))
    val clean = (0 until Media.PhashBands).exists { b =>
      ((base >>> (b * bandBits)) & ((1L << bandBits) - 1)) ==
        ((flipped >>> (b * bandBits)) & ((1L << bandBits) - 1))
    }
    clean shouldBe true
  }
}
