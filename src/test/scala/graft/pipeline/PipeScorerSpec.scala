package graft.pipeline

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** X1/X2 fidelity: subprocess protocol, malformed-row drop policy,
  * ignored exit codes, stdout/stderr separation. */
class PipeScorerSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Writes an executable shell script and returns its path. */
  private def script(body: String): Path = {
    val p = Files.createTempFile("graft_scorer_", ".sh")
    Files.writeString(p, s"#!/bin/sh\n$body\n")
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p.toFile.deleteOnExit()
    p
  }

  test("parses 3-field CSV rows; drops comments, blanks, malformed rows") {
    val s = script(
      """while IFS= read -r line; do
        |  case "$line" in
        |    bad*)  echo "only,two" ;;
        |    wide*) echo "$line,1,0.5,extra" ;;
        |    *)     echo "# comment"; echo ""; echo "$line,2,0.7500" ;;
        |  esac
        |done < "$1"""".stripMargin)
    val scorer = new PipeScorer(Seq("/bin/sh", s.toString))
    // FIXTURES.md A3: valid, comment, blank, 2-field, and 4-field rows.
    val out = scorer.scoreKeyed(Seq("alpha", "bad-row", "wide-row", "beta"))
    out shouldBe Map("alpha" -> ((2, 0.75)), "beta" -> ((2, 0.75)))
  }

  test("non-zero exit code is ignored; produced rows still count (X1 policy)") {
    val s = script("""head -n 1 "$1" | sed 's/$/,0,0.1000/'; exit 3""")
    val scorer = new PipeScorer(Seq("/bin/sh", s.toString))
    val out = scorer.scoreKeyed(Seq("first", "second"))
    out shouldBe Map("first" -> ((0, 0.1)))
  }

  test("stderr is log, not data") {
    val s = script("""echo "diagnostic" >&2; sed 's/$/,1,0.5000/' "$1"""")
    val scorer = new PipeScorer(Seq("/bin/sh", s.toString))
    val out = scorer.scoreKeyed(Seq("x"))
    out shouldBe Map("x" -> ((1, 0.5)))
  }

  test("StreamingPipeScorer: one long-lived process scores many payloads in order") {
    val s = script("""while IFS= read -r line; do echo "$line,4,0.8000"; done""")
    val scorer = new StreamingPipeScorer(Seq("/bin/sh", s.toString))
    scorer.init()
    try {
      (1 to 100).foreach { i =>
        scorer.score(s"payload-$i") shouldBe ((4, 0.8))
      }
    } finally scorer.close()
  }

  test("StreamingPipeScorer drives the typed pipeline end-to-end") {
    import spark.implicits._
    val s = script("""while IFS= read -r line; do echo "$line,7,0.6000"; done""")
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val items = (1 to 50).map(i => Item(s"p$i", s"doc $i")).toDS().repartition(2)
    val out = Infer.classify(items,
      new StreamingPipeScorer(Seq("/bin/sh", s.toString)), labels,
      batchSize = 8).collect()
    out.length shouldBe 50
    out.foreach { p => p.label shouldBe labels(7); p.prob shouldBe 0.6 }
  }

  test("S3 parity: script shipped with sc.addFile, resolved via SparkFiles.get") {
    import spark.implicits._
    val s = script("""sed 's/$/,5,0.4000/' "$1"""")
    spark.sparkContext.addFile(s.toString)
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val items = (1 to 10).map(i => Item(s"p$i", s"payload $i")).toDS().repartition(2)
    val out = Infer.classifyPiped(items,
      PipeScorer.fromSparkFiles(s.getFileName.toString), labels).collect()
    out.length shouldBe 10
    out.foreach { p => p.label shouldBe labels(5); p.prob shouldBe 0.4 }
  }

  test("CheckpointScorer: model artifact shipped via addFile drives predictions") {
    import spark.implicits._
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    def ship(name: String, content: String): String = {
      val d = Files.createTempDirectory("graft_ckpt_")
      val f = d.resolve(name)
      Files.writeString(f, content)
      f.toFile.deleteOnExit()
      spark.sparkContext.addFile(f.toString)
      name
    }
    val items = (1 to 20).map(i => Item(s"p$i", s"payload $i")).toDS().repartition(2)

    val a1 = Infer.classify(items,
      new CheckpointScorer(ship("ckpt_a.bin", "weights-v1"), labels.size),
      labels).collect().map(p => p.path -> (p.label, p.prob)).toMap
    val a2 = Infer.classify(items,
      new CheckpointScorer("ckpt_a.bin", labels.size), labels)
      .collect().map(p => p.path -> (p.label, p.prob)).toMap
    a2 shouldBe a1 // same checkpoint → identical predictions

    val b = Infer.classify(items,
      new CheckpointScorer(ship("ckpt_b.bin", "weights-v2"), labels.size),
      labels).collect().map(p => p.path -> (p.label, p.prob)).toMap
    b should not equal a1 // different weights → observably different model
  }

  test("StreamingPipeScorer child is reaped when the task completes") {
    import spark.implicits._
    val pidFile = Files.createTempFile("graft_pid_", ".txt")
    pidFile.toFile.deleteOnExit()
    val s = script(
      s"""echo $$$$ > "$pidFile"
         |while IFS= read -r line; do echo "$$line,1,0.5000"; done""".stripMargin)
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val items = (1 to 5).map(i => Item(s"p$i", s"doc $i")).toDS().repartition(1)
    val out = Infer.classify(items,
      new StreamingPipeScorer(Seq("/bin/sh", s.toString)), labels).collect()
    out.length shouldBe 5
    val pid = Files.readString(pidFile).trim
    pid should not be empty
    // The task-completion listener closes the child; poll until /proc
    // entry vanishes (forceful destroy + JVM reaper can lag the action).
    val deadline = System.nanoTime() + 10_000_000_000L
    while (Files.exists(java.nio.file.Paths.get(s"/proc/$pid")) &&
      System.nanoTime() < deadline) Thread.sleep(100)
    Files.exists(java.nio.file.Paths.get(s"/proc/$pid")) shouldBe false
  }

  test("classifyPiped drops unechoed rows silently and counts them") {
    import spark.implicits._
    val s = script("""grep -v skip "$1" | sed 's/$/,3,0.9000/'""")
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val items = Seq(Item("a", "keep1"), Item("b", "skipme"), Item("c", "keep2"))
      .toDS().repartition(1)
    val acc = spark.sparkContext.longAccumulator("dropped")
    val out = Infer.classifyPiped(items, new PipeScorer(Seq("/bin/sh", s.toString)),
      labels, dropped = Some(acc)).collect()
    out.map(_.path).sorted shouldBe Array("a", "c")
    out.foreach { p => p.label shouldBe labels(3); p.prob shouldBe 0.9 }
    acc.value shouldBe 1L
  }
}
