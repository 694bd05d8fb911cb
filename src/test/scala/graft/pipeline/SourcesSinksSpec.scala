package graft.pipeline

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SourcesSinksSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Deterministic property sampling (the scalatestplus bridge isn't in
    * the offline cache, so drive ScalaCheck's Gen directly). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("manifest: trims, drops empties, strips leading BOM (S1+F1)") {
    val f = Files.createTempFile("manifest_", ".txt")
    Files.writeString(f,
      "﻿/user/binh/garbage/shoes/shoes_1.jpg\n\n  /a/b c.png  \n   \n/x.jpg")
    val rows = Sources.manifest(spark, f.toString).collect().sorted
    rows shouldBe Array("/a/b c.png", "/user/binh/garbage/shoes/shoes_1.jpg", "/x.jpg")
  }

  test("sanitize: output alphabet is [A-Za-z0-9._-] and it is idempotent (F2)") {
    forAllSampled(Gen.asciiStr) { s =>
      val out = Sources.sanitizeFileName(s)
      out should fullyMatch regex "[A-Za-z0-9._-]*"
      Sources.sanitizeFileName(out) shouldBe out
      out.length shouldBe s.length
    }
  }

  test("sanitize matches the reference's example shape") {
    Sources.sanitizeFileName("doc 42@img.jpg") shouldBe "doc_42_img.jpg"
    Sources.basename("/user/binh/garbage/shoes/shoes_1.jpg") shouldBe "shoes_1.jpg"
  }

  test("TSV sink: sorted keys, tab separator, %.4f probabilities (K1+M6+SH1)") {
    import spark.implicits._
    // FIXTURES.md A4: duplicate keys must be PRESERVED (identity reduce,
    // not dedup) — hence two rows for /m/mid.jpg.
    val preds = Seq(
      Prediction("/z/last.jpg", "shoes", 0.5),
      Prediction("/a/first.jpg", "tea_bags", 0.98765),
      Prediction("/m/mid.jpg", "clothing", 0.0),
      Prediction("/m/mid.jpg", "magazines", 0.25)).toDS()
    val out = Files.createTempDirectory("tsv_").resolve("out").toString
    Sinks.writeTsv(preds, out, singleFile = true)

    val files = new java.io.File(out).listFiles.filter(_.getName.startsWith("part-"))
    files.length shouldBe 1
    val lines = Files.readAllLines(files.head.toPath)
    lines.size shouldBe 4
    lines.get(0) shouldBe "/a/first.jpg\ttea_bags,0.9877"
    Set(lines.get(1), lines.get(2)) shouldBe
      Set("/m/mid.jpg\tclothing,0.0000", "/m/mid.jpg\tmagazines,0.2500")
    lines.get(3) shouldBe "/z/last.jpg\tshoes,0.5000"
  }
}
