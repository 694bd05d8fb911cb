package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q179: Church–Gale burstiness. Hand-planted vocabulary pins the
  * statistic exactly — a template term repeating 10× per containing
  * doc reads burst 10·10⁶, a function word reads exactly 10⁶, and a
  * huge-burst term below the df floor is EXCLUDED (singleton-df burst
  * is the term's own tf — noise the floor exists to drop). */
class BurstinessSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def write(dir: String, docs: Seq[String]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case (text, i) =>
      (i.toLong, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("exact burst values; df floor excludes the singleton screamer") {
    val tmpl = Array.fill(10)("tmpl").mkString(" ")
    val docs =
      // "tmpl" 10× in each of 5 docs (burst 10.0), "the" once in each
      (0 until 5).map(i => s"the $tmpl filler$i") ++
        // "the" in 3 more docs to spread df without repeats
        (0 until 3).map(i => s"the only$i") :+
        // "rare": 20× but df=1 — must not appear despite burst 20.0
        Array.fill(20)("rare").mkString(" ")
    val dir = Files.createTempDirectory("burst_").toString
    write(dir, docs)

    val rows = SparkEntry.queries("q179_burstiness")(spark, dir).collect()
    val got = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    got.keySet should contain("tmpl")
    got.keySet should not contain "rare" // df floor
    got("tmpl") shouldBe ((50L, 5L, 10000000L))
    got("the") shouldBe ((8L, 8L, 1000000L))
    // ranked by burst: the template term leads the function word
    rows.map(_.getString(0)).indexOf("tmpl") should be <
      rows.map(_.getString(0)).indexOf("the")
  }
}
