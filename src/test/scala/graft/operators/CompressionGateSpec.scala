package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.pipeline.HashScorer

/** The compression gate must catch BOTH junk tails q80 and q87 split
  * between them: a template loop deflates to near nothing
  * (too_repetitive), hash-random gibberish deflates to nearly its own
  * size (incompressible), and word-vocabulary prose sits in the ok
  * band; ratios are deterministic across runs, and the whole scorer
  * is a stateless per-row map (streams unchanged). */
class CompressionGateSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextAnalysis.compressionGate(
      rows.toDF("doc_id", "text"))
      .collect().map(s => s.doc_id -> s).toMap
  }

  test("template loop / gibberish / prose land in their bands; ratios " +
      "are deterministic") {
    val loop = Seq.fill(200)("click here to subscribe now").mkString(" ")
    // full printable range (94 symbols), hash-driven — no structure
    // beyond the alphabet for DEFLATE to find
    val gibberish = (0 until 960).map { i =>
      val h = HashScorer.md5u32(s"g$i")
      ((h % 94) + 33).toChar
    }.mkString("")
    val vocab = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dogs", "while", "seven", "wizards", "brew", "quartz",
      "elixirs", "under", "amber", "skies")
    val prose = (0 until 300).map(i =>
      vocab((HashScorer.md5u32(s"p$i") % vocab.length).toInt)).mkString(" ")

    val out = run(Seq((1L, loop), (2L, gibberish), (3L, prose)))
    out(1L).flag shouldBe "too_repetitive"
    out(2L).flag shouldBe "incompressible"
    out(3L).flag shouldBe "ok"
    out(1L).ratio_u should be < TextAnalysis.CompressLowCutU
    out(2L).ratio_u should be > TextAnalysis.CompressHighCutU

    // deterministic: byte-identical scores on a re-run
    val again = run(Seq((1L, loop), (2L, gibberish), (3L, prose)))
    again.view.mapValues(s => (s.n_compressed, s.ratio_u)).toMap shouldBe
      out.view.mapValues(s => (s.n_compressed, s.ratio_u)).toMap
  }

  test("empty text is incompressible by convention, not a crash") {
    val out = run(Seq((1L, "")))
    out(1L).ratio_u shouldBe 1000000L
    out(1L).flag shouldBe "incompressible"
  }

  test("the streaming gate equals the batch scorer across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      1L -> Seq.fill(200)("click here to subscribe now").mkString(" "),
      2L -> (0 until 960).map(i =>
        ((HashScorer.md5u32(s"g$i") % 94) + 33).toChar).mkString(""),
      3L -> "plain ordinary words in a sentence of middling structure")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val q = graft.streaming.QualityStreams.compressionGate(
      mem.toDF().toDF("doc_id", "text"),
      (b, _) => seen.synchronized {
        b.collect().foreach(r => seen(r.getLong(0)) =
          (r.getLong(3), r.getString(4)))
      })
    try {
      rows.grouped(2).foreach { chunk => mem.addData(chunk); q.processAllAvailable() }
      val batch = run(rows)
      seen.synchronized {
        rows.foreach { case (id, _) =>
          seen(id) shouldBe ((batch(id).ratio_u, batch(id).flag))
        }
      }
    } finally q.stop()
  }
}
