package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property coverage for the cross-engine determinism toolkit. */
class ParityTextFnsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def forAllSampled[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("dsum is order-independent: reversed input gives the identical bits") {
    import spark.implicits._
    val vals = (1 to 4000).map(i => (i % 7) * 1234.5678 + i * 0.0001)
    val fwd = vals.toDF("x").agg(Parity.dsum(col("x"))).head.getDouble(0)
    val rev = vals.reverse.toDF("x").repartition(13)
      .agg(Parity.dsum(col("x"))).head.getDouble(0)
    java.lang.Double.doubleToLongBits(fwd) shouldBe
      java.lang.Double.doubleToLongBits(rev)
  }

  test("md5u32 column matches the JVM twin used by HashScorer") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "ünïcode ✓", "x" * 500)
    val fromSpark = samples.toDF("s")
      .select(col("s"), Parity.md5u32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      fromSpark(s) shouldBe graft.pipeline.HashScorer.md5u32(s)
    }
  }

  test("md5u32 stays in unsigned 32-bit range") {
    import spark.implicits._
    val hs = (1 to 1000).map(_.toString).toDF("s")
      .select(Parity.md5u32(col("s")).as("h")).as[Long].collect()
    all(hs) should (be >= 0L and be < (1L << 32))
  }

  test("MinHash permutation constants stay below the exact-int64 bound") {
    // a * h + b with h < 2^32 must not overflow 2^63 (exactness contract)
    TextFns.As.foreach { a =>
      BigInt(a) * BigInt(2).pow(32) + 1048573L should be < BigInt(2).pow(63)
    }
    TextFns.As.distinct.size shouldBe TextFns.MinHashK // distinct perms
  }

  test("shingles equals the naive reference implementation") {
    import spark.implicits._
    val wordGen = Gen.listOfN(12, Gen.oneOf("a", "bb", "ccc", "d1", "e-e"))
      .map(_.mkString(" "))
    forAllSampled(Gen.choose(0, 11).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1")).map(_.mkString(" "))), 60) { text =>
      val got = Seq(text).toDF("text")
        .select(TextFns.shingles(col("text")).as("ss"))
        .head.getSeq[String](0)
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length >= 3)
          toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        else Seq.empty
      got shouldBe expected
    }
    // shared fixture shape: spaces inside shingles, distinct preserved-order
    val one = Seq("x y z x y z").toDF("text")
      .select(TextFns.shingles(col("text")).as("ss")).head.getSeq[String](0)
    one shouldBe Seq("x y z", "y z x", "z x y")
  }

  test("shingleOccurrences keeps repeats (the q80 signal shingles drops)") {
    import spark.implicits._
    forAllSampled(Gen.choose(0, 11).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1")).map(_.mkString(" "))), 60) { text =>
      val got = Seq(text).toDF("text")
        .select(TextFns.shingleOccurrences(col("text")).as("ss"))
        .head.getSeq[String](0)
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq.empty
      got shouldBe expected
    }
    // a phrase loop repeats its shingles — occurrences > distinct
    val looped = Seq("x y z x y z").toDF("text")
      .select(TextFns.shingleOccurrences(col("text")).as("ss"))
      .head.getSeq[String](0)
    looped shouldBe Seq("x y z", "y z x", "z x y", "x y z")
  }

  test("q80 repetition gate fires on a phrase loop, not on diverse prose") {
    // Regression for the round-5 fix: over the DISTINCT shingle feature
    // table, n_grams - n_distinct was zero for EVERY document, so the
    // gate could never fire. Pin the semantics on a synthetic corpus.
    import spark.implicits._
    val loop = ("spam phrase loop " * 20).trim            // one 3-gram cycle
    val prose = (1 to 60).map(i => s"w$i").mkString(" ")  // all distinct
    val dir = java.nio.file.Files.createTempDirectory("q80gate").toString
    Seq((0L, loop, "en", "src0", loop.length.toLong),
        (1L, prose, "en", "src0", prose.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q80_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    rows(0L) shouldBe true
    rows(1L) shouldBe false
  }
}
