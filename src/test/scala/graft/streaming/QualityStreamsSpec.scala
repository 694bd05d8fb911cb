package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import graft.operators.TextAnalysis

/** Stream/batch parity for the quality gate: the MemoryStream-driven
  * [[QualityStreams.qualityGate]] must make exactly batch q89's
  * decisions on the same corpus + frozen LM, across multiple
  * micro-batches (no cross-batch state exists, so batch boundaries must
  * not matter), and the LM must stay FROZEN (scores derive from the
  * side-input table, not the stream's own contents).
  */
class QualityStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("MemoryStream gate decisions equal batch q89 across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val docs = graft.Tables.documents(spark, dir)
    val lm = TextAnalysis.lmTable(spark, dir)

    val rows = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val collected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean, String)]
    var batches = 0
    val q = QualityStreams.qualityGate(memDocs, lm, (decisions, _) =>
      collected.synchronized {
        collected ++= decisions
          .select("doc_id", "rep_frac_u", "xent_u", "admit", "reason")
          .as[(Long, Long, Long, Boolean, String)].collect()
        batches += 1
      })
    try {
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    batches should be > 1
    val batch = SparkEntry.queries("q89_quality_gate")(spark, dir)
      .select("doc_id", "rep_frac_u", "xent_u", "admit", "reason")
      .as[(Long, Long, Long, Boolean, String)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // no row scored twice
  }

  test("the gate rejects with first-failing-gate attribution and a " +
      "frozen LM (off-distribution docs rejected even arriving alone)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lm = TextAnalysis.lmTable(spark, SparkSpec.Sf0001)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val out = scala.collection.mutable.Map.empty[Long, (Boolean, String)]
    val q = QualityStreams.qualityGate(memDocs, lm, (d, _) =>
      out.synchronized {
        d.select("doc_id", "admit", "reason")
          .as[(Long, Boolean, String)].collect()
          .foreach { case (id, a, r) => out(id) = (a, r) }
      })
    try {
      val loop = Seq.fill(30)("key agg row").mkString(" ") // 3-gram loop
      mem.addData(Seq(
        (1000L, "key agg row scan slow fast table value part hash", "en", "sX", 10L),
        (1001L, "a b", "en", "sX", 3L), // length gate
        (1002L, loop, "en", "sX", loop.length.toLong), // repetition gate
        // lm gate: 'dup' is IN the frozen LM but maximally rare there
        // (alternating with common words so the repetition gate stays
        // quiet and the LM gate is what fires) — xent ≈ 5.03e6 µnats
        (1003L, "dup key dup agg dup row dup scan dup slow", "en", "sX", 41L)))
      q.processAllAvailable()
    } finally q.stop()

    out(1000L) shouldBe ((true, "admit"))
    out(1001L) shouldBe ((false, "length"))
    out(1002L)._1 shouldBe false
    out(1002L)._2 shouldBe "repetition"
    out(1003L) shouldBe ((false, "lm_quality"))
  }

  test("fully-OOV documents (tokens or whole language absent from the " +
      "frozen LM) are rejected at max surprisal, not admitted") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lm = TextAnalysis.lmTable(spark, SparkSpec.Sf0001)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")

    val out = scala.collection.mutable.Map.empty[Long, (Boolean, Long, String)]
    val q = QualityStreams.qualityGate(memDocs, lm, (d, _) =>
      out.synchronized {
        d.select("doc_id", "admit", "xent_u", "reason")
          .as[(Long, Boolean, Long, String)].collect()
          .foreach { case (id, a, x, r) => out(id) = (a, x, r) }
      })
    try {
      mem.addData(Seq(
        // every token absent from the LM's 'en' vocabulary: with the
        // old inner join this doc produced ZERO xent rows, na.fill'd
        // to xent_u=0, and was ADMITTED; add-one scoring now prices
        // each token at ln(total_en / 1) — max surprisal
        (2000L, "zzqx vvkw qqplm xxjmr wwnrt bbgh ccfy ddkz eeqv ffxw",
          "en", "sX", 56L),
        // a language the LM has never seen: (lang, w) misses for every
        // token AND the per-lang total misses; the denominator falls
        // back to the LM's largest language total
        (2001L, "plain ordinary words that look entirely harmless here",
          "zz", "sX", 52L)))
      q.processAllAvailable()
    } finally q.stop()

    out(2000L)._1 shouldBe false
    out(2000L)._3 shouldBe "lm_quality"
    out(2000L)._2 should be > TextAnalysis.LmXentMaxU
    out(2001L)._1 shouldBe false
    out(2001L)._3 shouldBe "lm_quality"
  }

  test("conf-gated compression leg: both deflate tails are rejected " +
      "with 'compression' attribution, rule gates keep priority, " +
      "stream decisions equal batch, and 'off' admits the tails") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Features

    // Planted vocabulary where every word is COMMON in a custom frozen
    // LM (ln(total/cnt) = ln(10) ≈ 2.30M µnats < the 3.5M gate), so the
    // LM leg admits everything and the deflate tails are isolated.
    val padWords = (0 until 20).map(i => ("a" * 25) + ('a' + i).toChar)
    val rnd = new scala.util.Random(7)
    def rword(len: Int) =
      Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    val okWords = Vector.fill(60)(rword(7)).distinct
    val incWords = Vector.fill(5)(rword(8)).distinct
    val allWords =
      (padWords ++ okWords ++ incWords ++ Seq("x", "y", "z")).distinct
    val lm = allWords.map(w => ("en", w, 3000L, 30000L))
      .toDF("lang", "w", "cnt", "total_l")

    val fixtures = Seq(
      // 20 distinct 26-char runs: zero duplicate 3-grams, in-vocab,
      // but deflate crushes the character runs → too_repetitive tail
      (1L, padWords.mkString(" ")),
      // varied random words: mid-range deflate ratio → admitted
      (2L, okWords.mkString(" ")),
      // 5 short random words: deflate overhead dominates → the
      // incompressible tail
      (3L, incWords.mkString(" ")),
      // word-level loop: too_repetitive by deflate TOO, but the
      // repetition rule fires first — attribution order is the pin
      (4L, Seq.fill(30)("x y z").mkString(" ")))
    val docs = fixtures.map { case (id, t) =>
      (id, t, "en", "sX", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    // The fixture really exercises both tails (diagnosable if the
    // deflate-ratio assumptions drift).
    val flags = TextAnalysis.compressionGate(docs)
      .collect().map(s => s.doc_id -> s.flag).toMap
    flags(1L) shouldBe "too_repetitive"
    flags(2L) shouldBe "ok"
    flags(3L) shouldBe "incompressible"

    def decide() = TextAnalysis.qualityDecisions(docs, lm)
      .select("doc_id", "admit", "reason")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val offMode = decide() // default: 3-gate table, tails admitted
    offMode(1L) shouldBe ((true, "admit"))
    offMode(3L) shouldBe ((true, "admit"))
    offMode(4L) shouldBe ((false, "repetition"))

    spark.conf.set(Features.CompressionGateConf, "on")
    try {
      val onMode = decide()
      onMode(1L) shouldBe ((false, "compression"))
      onMode(2L) shouldBe ((true, "admit"))
      onMode(3L) shouldBe ((false, "compression"))
      onMode(4L) shouldBe ((false, "repetition")) // rules keep priority

      // stream == batch under the same conf (shared scorer code path)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, String, String, String, Long)]
      val memDocs =
        mem.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = scala.collection.mutable.Map.empty[Long, (Boolean, String)]
      val q = QualityStreams.qualityGate(memDocs, lm, (d, _) =>
        out.synchronized {
          d.select("doc_id", "admit", "reason")
            .as[(Long, Boolean, String)].collect()
            .foreach { case (id, a, r) => out(id) = (a, r) }
        })
      try {
        fixtures.foreach { case (id, t) =>
          mem.addData(Seq((id, t, "en", "sX", t.length.toLong)))
          q.processAllAvailable()
        }
      } finally q.stop()
      out.toMap shouldBe onMode
    } finally spark.conf.unset(Features.CompressionGateConf)
  }

  test("gopher gate: MemoryStream rule flags equal batch q115 across " +
      "micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = SparkSpec.Sf0001
    val rows = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val memDocs = mem.toDF().toDF("doc_id", "text", "n_chars")

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
    val q = QualityStreams.gopherGate(memDocs, (scored, _) =>
      collected.synchronized {
        collected ++= scored
          .select("doc_id", "r_wordcount", "r_wordlen", "r_stop", "r_rep",
            "admit")
          .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      })
    try {
      rows.grouped((rows.size + 3) / 4).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batch = SparkEntry.queries("q115_gopher_rules")(spark, dir)
      .select("doc_id", "r_wordcount", "r_wordlen", "r_stop", "r_rep",
        "admit")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    collected.toSet shouldBe batch.toSet
    collected.size shouldBe batch.length // one verdict per doc
  }
}
