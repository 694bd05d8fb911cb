package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import Media._

class MediaSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def tmpMediaDir(): String = {
    val d = Files.createTempDirectory("media_")
    Files.write(d.resolve("a.jpg"), "fake-jpeg-bytes".getBytes)
    Files.write(d.resolve("b.mp4"), "fake-video-bytes-somewhat-longer".getBytes)
    Files.write(d.resolve("c.wav"), "fake-audio".getBytes)
    d.toString
  }

  test("binaryFile source: path, kind sniff, content round-trip") {
    val objs = binaryObjects(spark, tmpMediaDir()).collect()
      .map(m => Sources.basename(m.path) -> m).toMap
    objs.keySet shouldBe Set("a.jpg", "b.mp4", "c.wav")
    objs("a.jpg").kind shouldBe "image"
    objs("b.mp4").kind shouldBe "video"
    objs("c.wav").kind shouldBe "audio"
    new String(objs("a.jpg").content) shouldBe "fake-jpeg-bytes"
  }

  test("decodeAll: deterministic stub dims, video frames, failure sentinel") {
    import spark.implicits._
    // binaryFile skips zero-byte files, so the undecodable-object path is
    // exercised with an explicit empty-content row.
    val withEmpty = binaryObjects(spark, tmpMediaDir())
      .union(Seq(MediaObject("/m/empty.png", "image", Array.empty[Byte])).toDS())
    val metas = decodeAll(withEmpty, batchSize = 2)
      .collect().map(m => Sources.basename(m.path) -> m).toMap

    val img = metas("a.jpg")
    img.ok shouldBe true
    img.width should (be >= 1 and be <= 1920)
    img.height should (be >= 1 and be <= 1080)
    img.nFrames shouldBe 1 // only video kind gets frames
    metas("b.mp4").nFrames should be >= 1

    val bad = metas("empty.png")
    bad.ok shouldBe false
    (bad.width, bad.height, bad.nFrames) shouldBe ((0, 0, 0))

    // Determinism: decoding the same bytes twice gives identical dims.
    decodeStub("fake-jpeg-bytes".getBytes) shouldBe
      decodeStub("fake-jpeg-bytes".getBytes)
  }

  test("extractFeatures: fixed dim, deterministic, undecodable rows dropped") {
    val feats = extractFeatures(binaryObjects(spark, tmpMediaDir()))
      .collect().map(f => Sources.basename(f.path) -> f).toMap
    feats.keySet shouldBe Set("a.jpg", "b.mp4", "c.wav")
    feats.values.foreach(_.features.length shouldBe FeatureDim)
    feats("a.jpg").features shouldBe featureStub("fake-jpeg-bytes".getBytes)
  }

  test("fetchByManifest: only manifest-addressed blobs are fetched") {
    import spark.implicits._
    val dir = tmpMediaDir() // contains a.jpg, b.mp4, c.wav
    val manifest = Seq(s"$dir/a.jpg", s"$dir/c.wav").toDS()
    val objs = Media.fetchByManifest(manifest).collect()
      .map(m => Sources.basename(m.path) -> m).toMap
    objs.keySet shouldBe Set("a.jpg", "c.wav") // b.mp4 not asked for
    new String(objs("a.jpg").content) shouldBe "fake-jpeg-bytes"
    objs("c.wav").kind shouldBe "audio"
  }

  test("fetchByManifest: strict mode fails the job on a missing blob (reference policy)") {
    import spark.implicits._
    val dir = tmpMediaDir()
    val manifest = Seq(s"$dir/a.jpg", s"$dir/nope.png").toDS()
    an[org.apache.spark.SparkException] should be thrownBy
      Media.fetchByManifest(manifest).collect()
  }

  test("fetchByManifest: non-strict skips and counts missing blobs") {
    import spark.implicits._
    val dir = tmpMediaDir()
    val manifest = Seq(s"$dir/a.jpg", s"$dir/nope.png", s"$dir/c.wav").toDS()
    val acc = spark.sparkContext.longAccumulator("missing")
    val objs = Media.fetchByManifest(manifest, strict = false,
      missing = Some(acc)).collect()
    objs.map(m => Sources.basename(m.path)).sorted shouldBe Array("a.jpg", "c.wav")
    acc.value shouldBe 1L
  }

  test("frameSample: bounded count, concatenation-preserving slices") {
    val bytes = (0 until 1000).map(_.toByte).toArray
    val frames = frameSample(bytes, 4)
    frames.size should be <= 4
    frames.flatten.take(bytes.length) shouldBe
      bytes.take(frames.map(_.length).sum)
  }

  test("resizeStub: marks the transform and keeps payload") {
    val out = resizeStub("pixels".getBytes, 224, 224)
    new String(out) shouldBe "resized:224x224:pixels"
  }
}
