package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** Planted rule-breakers for the q115 Gopher-style filter set: each
  * rule must fire on exactly the document built to break it while the
  * clean control passes all four, and on the fixture corpus the rules
  * must do real discrimination (both admits and rejects). */
class GopherRulesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(id: Long, text: String) =
    (id, text, "en", "src0", text.length.toLong)

  test("each rule fires on its planted breaker; the control passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gopher_").toString

    val varied = (0 until 60).map(i => s"w${i % 31}x")
    val clean = doc(0L, ("the a " + varied.mkString(" ")))
    val tooShort = doc(1L, "the a one two three four five six seven eight")
    val longWords = doc(2L,
      (0 until 60).map(i => s"extraordinarily$i").mkString(" ") + " the a")
    val noStops = doc(3L, (0 until 60).map(i => s"v${i % 37}q").mkString(" "))
    val repeated = doc(4L,
      "the a " + Seq.fill(58)("spam").mkString(" "))

    Seq(clean, tooShort, longWords, noStops, repeated)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q115_gopher_rules")(spark, dir)
      .select("doc_id", "r_wordcount", "r_wordlen", "r_stop", "r_rep", "admit")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    out(0L) shouldBe (0L, true, true, true, true, true)   // control
    out(1L)._2 shouldBe false                             // word count
    out(1L)._6 shouldBe false
    out(2L)._3 shouldBe false                             // mean word len
    out(3L)._4 shouldBe false                             // no stop words
    out(3L)._2 shouldBe true // word count fine — only the stop rule fires
    out(4L)._5 shouldBe false                             // repetition
    out(4L)._6 shouldBe false
  }

  test("on the fixture corpus the rules discriminate (admits AND rejects)") {
    import spark.implicits._
    val decisions = SparkEntry.queries("q115_gopher_rules")(
        spark, SparkSpec.Sf0001)
      .select("admit").as[Boolean].collect()
    decisions should contain(true)
    decisions should contain(false)
  }
}
