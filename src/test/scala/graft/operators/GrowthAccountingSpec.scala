package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q202: daily growth accounting. Planted lifecycles exercise every
  * class — new, retained, resurrected after a gap, churned — and the
  * spec asserts the ledger's two exact identities:
  * active = new + retained + resurrected, and
  * churned(d) = active(d−1) − retained(d). */
class GrowthAccountingSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val day = 86400000L
  private def ts(d: Long): Timestamp = new Timestamp(1704067200000L + d * day)

  test("new/retained/resurrected/churned classes and the exact identities") {
    import spark.implicits._
    val dir = Files.createTempDirectory("growth_").toString
    // user 1: days 0,1,3 (retained then resurrected); user 2: day 0
    // only (churns into day 1); user 3: days 1,2.
    val active = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (3L, 1L), (3L, 2L))
    active.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong + 1L, ts(d), u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val rows = SparkEntry.queries("q202_growth_accounting")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))

    val base = 1704067200L / 86400L // epoch day of the fixture origin
    val byDay = rows.map { case (d, v) => (d - base, v) }.toMap
    // (n_active, n_new, n_retained, n_resurrected, n_churned)
    byDay(0L) shouldBe ((2L, 2L, 0L, 0L, 0L))
    byDay(1L) shouldBe ((2L, 1L, 1L, 0L, 1L)) // user 2 churns
    byDay(2L) shouldBe ((1L, 0L, 1L, 0L, 1L)) // user 1 lapses
    byDay(3L) shouldBe ((1L, 0L, 0L, 1L, 1L)) // user 3 churns, 1 returns
    byDay.values.foreach { case (a, n, ret, res, _) =>
      a shouldBe (n + ret + res)
    }
  }
}
