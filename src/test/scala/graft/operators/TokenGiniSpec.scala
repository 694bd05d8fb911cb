package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q164's concentration audit, hand-pinned on the two boundary
  * geometries: a perfectly equal source must read Gini exactly 0 with
  * the top decile holding exactly its proportional share, and a planted
  * one-giant-doc source must read the hand-computed Gini (0.6 in
  * micro-units) with the giant holding its exact mass share. */
class TokenGiniSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("equal source reads gini 0; skewed source reads the " +
      "hand-computed concentration") {
    import spark.implicits._
    val rows =
      // sEq: five docs x 10 tokens — perfect equality
      (1 to 5).map(i => (i.toLong, doc(10), "sEq")) ++
        // sSkew: [1,1,1,1,16] — Σx=20, Σi·x=90, gini=(180−120)/100=0.6
        (11 to 14).map(i => (i.toLong, doc(1), "sSkew")) :+
        (15L, doc(16), "sSkew")
    val dir = Files.createTempDirectory("gini_").toString
    rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q164_token_gini")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // top decile of 5 docs = ceil(5/10) = 1 doc
    got("sEq") shouldBe ((5L, 50L, 0L, 200000L))     // 10/50 share
    got("sSkew") shouldBe ((5L, 20L, 600000L, 800000L)) // 16/20 share
  }
}
