package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec, Tables}

/** q157 is a COMPOSITION: every datasheet column must reconcile
  * exactly against the production stage it summarizes (the plan==
  * report discipline) — volume against direct aggregation, duplicate
  * mass against the shared fingerprint, quality admits against q89's
  * decision table, contamination against q73's flagged set. */
class DatasheetSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dir = SparkSpec.Sf0001

  test("every column reconciles against the stage it summarizes") {
    import spark.implicits._
    val card = SparkEntry.queries("q157_datasheet")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    card should not be empty

    val docs = Tables.documents(spark, dir)

    // volume: docs / tokens / langs
    val vol = docs.groupBy($"source")
      .agg(count(lit(1)).as("d"),
        sum(org.apache.spark.sql.functions
          .size(graft.functions.TextFns.tokens($"text")).cast("long")).as("t"),
        countDistinct($"lang").as("l"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    card.foreach { case (src, r) =>
      (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe vol(src)
    }

    // duplicate mass: docs whose content fingerprint repeats corpus-wide
    val fp = docs.select($"source",
      graft.functions.TextFns.contentFp($"text").as("fp"))
    val dupIds = fp.groupBy($"fp").count().filter($"count" > 1)
    val dup = fp.join(dupIds, "fp").groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    card.foreach { case (src, r) =>
      r.getLong(4) shouldBe dup.getOrElse(src, 0L)
    }

    // quality admits: q89's own decision table per source
    val admits = SparkEntry.queries("q89_quality_gate")(spark, dir)
      .filter($"admit").groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    card.foreach { case (src, r) =>
      r.getLong(5) shouldBe admits.getOrElse(src, 0L)
    }

    // contamination: q73's flagged doc set mapped through source
    val flagged = SparkEntry.queries("q73_decontamination")(spark, dir)
      .select($"doc_id")
    val contam = docs.join(flagged, "doc_id").groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    card.foreach { case (src, r) =>
      r.getLong(6) shouldBe contam.getOrElse(src, 0L)
    }

    // rates are the exact integer div of their counts
    card.values.foreach { r =>
      r.getLong(7) shouldBe 1000000L * r.getLong(4) / r.getLong(1)
      r.getLong(8) shouldBe 1000000L * r.getLong(5) / r.getLong(1)
      r.getLong(9) shouldBe 1000000L * r.getLong(6) / r.getLong(1)
    }
  }
}
