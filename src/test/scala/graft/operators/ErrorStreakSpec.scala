package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q221 (error-streak histogram) + q217 (LTV deciles) on planted
  * events: the gaps-and-islands identity must count MAXIMAL runs
  * (a view breaking a streak starts a new island), and the decile cut
  * must be exact equal-population with exact value units. */
class ErrorStreakSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val T0 = 1704067200000L // 2024-01-01 UTC

  private def write(rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("graft_streaks_")
    dir.toFile.deleteOnExit()
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  private def ev(id: Long, u: Long, tpe: String, v: Double = 1.0): Row =
    Row(id, new Timestamp(T0 + id * 1000L), u, tpe, v, "{}")

  test("q221: maximal consecutive-error runs — a non-error event " +
      "splits islands; per-length run and user counts exact") {
    // user 1: E E E view E  -> runs of 3 and 1
    // user 2: E            -> run of 1
    // user 3: view click   -> no error rows at all
    val dir = write(Seq(
      ev(1, 1, "error"), ev(2, 1, "error"), ev(3, 1, "error"),
      ev(4, 1, "view"), ev(5, 1, "error"),
      ev(6, 2, "error"),
      ev(7, 3, "view"), ev(8, 3, "click")))
    val hist = SparkEntry.queries("q221_error_streaks")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    hist shouldBe Map(
      1L -> ((2L, 2L)), // user1's singleton + user2's — 2 runs, 2 users
      3L -> ((1L, 1L)))
  }

  test("q217: exact equal-population deciles with exact value units " +
      "and monotone non-increasing decile sums") {
    // 20 users, user u's single event carries value u+1 (exact 2-dec)
    val dir = write((0 until 20).map(u =>
      ev(u.toLong + 1, u.toLong, "purchase", (u + 1).toDouble)))
    val rows = SparkEntry.queries("q217_ltv_deciles")(spark, dir).collect()
    rows.length shouldBe 10
    rows.map(_.getLong(1)).toSeq shouldBe Seq.fill(10)(2L) // 2 users each
    // decile 0 = top two users (values 20 + 19) in exact 1e-4 units
    rows.head.getLong(2) shouldBe (20L + 19L) * 10000L
    val sums = rows.map(_.getLong(2)).toSeq
    sums shouldBe sums.sorted.reverse // ranked desc by construction
    // shares: exact floor-div against the exact grand total 210*1e4
    val total = (1 to 20).map(_.toLong).sum * 10000L
    rows.foreach { r =>
      r.getLong(3) shouldBe (1000000L * r.getLong(2)) / total
    }
  }
}
