package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}
import EventStreams.EventRow
import GrowthStreams._

/** Streaming growth accounting: the consumer ledger over the emitted
  * day classes is bit-equal to batch q202's new/retained/resurrected
  * columns on an in-order feed; a same-day repeat folds nothing; an
  * older-day arrival surfaces as a late marker. */
class GrowthStreamsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val day = 86400000L
  private def ts(d: Long, hh: Long = 0L): Timestamp =
    new Timestamp(1704067200000L + d * day + hh * 3600000L)

  private def ev(id: Long, d: Long, u: Long, hh: Long = 0L): EventRow =
    EventRow(id, ts(d, hh), u, "click", 1.0, "{}")

  private val batch1 = Seq(ev(1, 0, 1), ev(2, 1, 1), ev(3, 0, 2), ev(4, 1, 3))
  private val batch2 = Seq(ev(5, 3, 1), ev(6, 2, 3), ev(7, 1, 3, hh = 5))

  test("final ledger bit-equal to batch q202's class columns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("growthstream_").toString
    (batch1 ++ batch2).toDF().write.parquet(s"$dir/events.parquet")
    val expected = SparkEntry.queries("q202_growth_accounting")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // day -> (new, retained, resurrected)

    val in = MemoryStream[EventRow]
    val q = dayClasses(in.toDS())
      .writeStream.format("memory").queryName("growth")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()

      val classes = spark.table("growth").as[DayClass].collect()
      classes.exists(_.cls == "late") shouldBe false
      val ledger = classes.groupBy(_.day).map { case (d, rows) =>
        d -> ((rows.count(_.cls == "new").toLong,
          rows.count(_.cls == "retained").toLong,
          rows.count(_.cls == "resurrected").toLong))
      }
      ledger shouldBe expected
    } finally q.stop()
  }

  test("frontier-day repeats fold nothing; an older day pages as late") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = dayClasses(in.toDS())
      .writeStream.format("memory").queryName("growth_late")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 2, 9)); q.processAllAvailable()
      // same frontier day again (another event that day) + a day the
      // frontier has already passed
      in.addData(ev(2, 2, 9, hh = 7), ev(3, 0, 9)); q.processAllAvailable()

      val got = spark.table("growth_late").as[DayClass].collect()
      got.count(_.cls == "new") shouldBe 1
      got.count(_.cls == "late") shouldBe 1
      got.length shouldBe 2 // the frontier repeat emitted nothing
    } finally q.stop()
  }
}
