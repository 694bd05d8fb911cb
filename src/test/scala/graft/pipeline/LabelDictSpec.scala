package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** M1 load precedence + the out-of-range fallback policy
  * (`/root/reference/python/predict_batch_threaded_local.py:41-52,159`). */
class LabelDictSpec extends AnyFunSuite with Matchers {

  test("file source: non-empty trimmed lines in file order") {
    val f = Files.createTempFile("labels_", ".txt")
    Files.writeString(f, "zebra\n  cat  \n\nant\n")
    LabelDict.load(f.toString).labels shouldBe IndexedSeq("zebra", "cat", "ant")
  }

  test("directory with subdirectories: sorted dir names, files ignored") {
    val d = Files.createTempDirectory("labels_")
    Files.createDirectory(d.resolve("shoes"))
    Files.createDirectory(d.resolve("aerosol_cans"))
    Files.createFile(d.resolve("notes.txt"))
    LabelDict.load(d.toString).labels shouldBe IndexedSeq("aerosol_cans", "shoes")
  }

  test("directory with only files: sorted unique stems") {
    val d = Files.createTempDirectory("labels_")
    Files.createFile(d.resolve("cat.jpg"))
    Files.createFile(d.resolve("ant.png"))
    Files.createFile(d.resolve("ant.txt"))
    LabelDict.load(d.toString).labels shouldBe IndexedSeq("ant", "cat")
  }

  test("out-of-range index falls back to labels(0)") {
    val d = LabelDict(IndexedSeq("first", "second"))
    d(1) shouldBe "second"
    d(-1) shouldBe "first"
    d(99) shouldBe "first"
  }

  test("label order matches Python sorted() for the reference's 30 names") {
    val ls = graft.operators.Pipeline.Labels
    ls.sorted shouldBe ls  // natural String order == Python byte-wise sort here
    ls.size shouldBe 30
    ls.head shouldBe "aerosol_cans"
    ls.last shouldBe "tea_bags"
  }
}
