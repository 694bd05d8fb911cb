package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q206: conversion-latency quantiles. Five planted conversions at
  * 10..50 s pin every nearest-rank cut exactly; a view-only session
  * and a purchase-BEFORE-view session must both stay out of the
  * latency population (q203's strict order at timestamp grain). */
class ConversionLatencySpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000L)

  test("exact nearest-rank table; non-converting sessions excluded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("convlat_").toString
    var id = 0L
    def ev(s: Long, u: Long, e: String) = { id += 1; (id, ts(s), u, e) }
    val rows =
      (1L to 5L).flatMap(u =>
        Seq(ev(0, u, "view"), ev(u * 10L, u, "purchase"))) ++
      Seq(ev(0, 6L, "view"),                       // never converts
        ev(0, 7L, "purchase"), ev(5, 7L, "view"))  // wrong order
    rows.map { case (i, t, u, e) => (i, t, u, e, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q206_conversion_latency")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    got.toSeq shouldBe Seq(
      (0L, 10L, 5L), (25L, 20L, 5L), (50L, 30L, 5L),
      (75L, 40L, 5L), (100L, 50L, 5L))
  }
}
