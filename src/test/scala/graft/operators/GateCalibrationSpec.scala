package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q167 is a COMPOSITION over q89's decisions, so the spec reconciles
  * it against the stage it summarizes (DatasheetSpec's discipline): a
  * driver-side re-bucketing of the q89 frame must reproduce every
  * calibration cell, and a planted short-doc population must land its
  * whole mass in the lowest octave under the `length` gate. */
class GateCalibrationSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("calibration cells reconcile against q89's decision frame; " +
      "short docs concentrate in bucket 0 as `length`") {
    import spark.implicits._
    def words(n: Int, tag: String): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    // three docs under QualityMinTokens=5 (octave 0), normal docs in
    // the 8- and 16-octaves, one long doc in the 64-octave
    val docs = Seq(
      (1L, "a b"), (2L, "c d e"), (3L, "f g h i"),
      (4L, words(9, "w")), (5L, words(12, "x")),
      (6L, words(20, "y")), (7L, words(70, "z")))
    val dir = Files.createTempDirectory("gatecal_").toString
    docs.map { case (id, t) => (id, t, "en", "sA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q167_gate_calibration")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap

    // independent re-bucketing of the stage q167 summarizes
    def bucket(n: Long): Long =
      if (n < 8) 0L else if (n < 16) 8L else if (n < 32) 16L
      else if (n < 64) 32L else if (n < 128) 64L else 128L
    val dec = SparkEntry.queries("q89_quality_gate")(spark, dir)
      .select("n_tokens", "reason").collect()
      .map(r => (bucket(r.getLong(0)), r.getString(1)))
    val ref = dec.groupBy(_._1).map { case (b, rows) =>
      def n(re: String) = rows.count(_._2 == re).toLong
      b -> ((rows.size.toLong, n("admit"), n("length"), n("repetition"),
        n("lm_quality"), 1000000L * n("admit") / rows.size))
    }
    got shouldBe ref

    // the planted short docs: all three in octave 0, all gated by length
    got(0L)._1 shouldBe 3L
    got(0L)._3 shouldBe 3L // n_length
    got(0L)._6 shouldBe 0L // admit rate
    got.keySet should contain(64L) // the 70-token doc's octave
  }
}
