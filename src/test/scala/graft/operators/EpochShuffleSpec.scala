package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkSpec}

/** q111 epoch-shuffle plan invariants on a 640-doc fixture: every epoch
  * is a complete partition of the corpus, shards are load-balanced, the
  * assignment is deterministic across runs, and epochs DECORRELATE —
  * a document rarely keeps its shard from one epoch to the next (the
  * property that makes per-epoch reshuffling real rather than a
  * relabeling of one fixed order).
  */
class EpochShuffleSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("epochs partition the corpus, shards balance, assignment is " +
      "deterministic, and consecutive epochs decorrelate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dir = Files.createTempDirectory("epoch_").toString

    (0 until 640).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i * 3 + j) % 40}").mkString(" "),
        "en", s"src${i % 4}", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q111_epoch_shuffle")(spark, dir).collect()
    val byEpoch = out.groupBy(_.getLong(0))
    byEpoch.keySet shouldBe Set(0L, 1L, 2L, 3L)
    byEpoch.values.foreach { rows =>
      // complete partition: every doc lands in exactly one shard
      rows.map(_.getLong(2)).sum shouldBe 640L
      // load balance: no shard is a straggler (mean 20 docs/shard)
      rows.map(_.getLong(2)).max should be <= 40L
      rows.length should be <= 32
    }

    // determinism: a second run reproduces the plan exactly
    val again = SparkEntry.queries("q111_epoch_shuffle")(spark, dir).collect()
    again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe
      out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq

    // decorrelation: recompute each doc's epoch-0 vs epoch-1 shard with
    // the operator's own hash — the stay-put fraction must be near the
    // 1/32 a fresh permutation gives, nowhere near the 100% a repeated
    // order would
    def shard(e: Int) = graft.functions.Parity.md5u32(
      concat(col("doc_id").cast("string"), lit("#ep"), lit(e.toString))) % 32L
    val stay = graft.Tables.documents(spark, dir)
      .select((shard(0) === shard(1)).as("same"))
      .filter(col("same")).count()
    stay.toDouble / 640.0 should be < 0.15
  }
}
