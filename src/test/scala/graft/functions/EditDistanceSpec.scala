package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property: the banded early-exit edit distance equals
  * `min(levenshtein(a, b), k+1)` — checked against a textbook full-matrix
  * reference, and against Spark's own `levenshtein` through both the
  * interpreted and codegen paths. */
class EditDistanceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def fullLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  private def within(a: String, b: String, k: Int): Int =
    EditDistance.within(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("banded distance equals capped full-matrix distance (500 random cases)") {
    val rnd = new scala.util.Random(42) // deterministic
    (1 to 500).foreach { _ =>
      def word = (0 until rnd.nextInt(24)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val (a, b, k) = (word, word, rnd.nextInt(13))
      withClue(s"a='$a' b='$b' k=$k: ") {
        within(a, b, k) shouldBe math.min(fullLev(a, b), k + 1)
      }
    }
  }

  test("edge cases: empty strings, identical strings, budget 0") {
    within("", "", 3) shouldBe 0
    within("", "abc", 2) shouldBe 3
    within("", "abc", 3) shouldBe 3
    within("abc", "abc", 0) shouldBe 0
    within("abc", "abd", 0) shouldBe 1 // over budget → k+1
    within("kitten", "sitting", 10) shouldBe 3
  }

  test("supplementary-plane chars count as ONE edit (code points, not UTF-16)") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16: a code-unit
    // implementation would charge 2 edits for it and diverge from both
    // Spark's and DuckDB's levenshtein. Pin code-point semantics.
    import org.apache.spark.sql.functions.{col, levenshtein}
    TextExprs.ensureRegistered(spark)
    val clef = "𝄞"
    within(clef, "", 3) shouldBe 1
    within(s"a${clef}b", "ab", 3) shouldBe 1
    within(s"a${clef}b", s"a${clef}c", 3) shouldBe 1
    within(clef, "𝄟", 3) shouldBe 1 // different non-BMP char
    // And agree with Spark's levenshtein on the same inputs.
    import spark.implicits._
    val rows = Seq((s"a${clef}b", "ab"), (clef, ""), (s"x$clef", s"y$clef"))
      .toDF("a", "b")
      .select(TextExprs.editWithin(col("a"), col("b"),
        org.apache.spark.sql.functions.lit(5)).as("banded"),
        levenshtein(col("a"), col("b")).as("full"))
      .collect()
    rows.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("graft_edit_within agrees with Spark levenshtein on real documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, least, levenshtein, lit}
    TextExprs.ensureRegistered(spark)
    val docs = graft.Tables.documents(spark, SparkSpec.Sf0001).limit(40)
      .select(col("text")).as[String].collect()
    val pairs = docs.sliding(2).collect { case Array(a, b) => (a, b) }.toSeq
    val rows = pairs.toDF("a", "b").select(
      TextExprs.editWithin(col("a"), col("b"), lit(50)).as("banded"),
      least(levenshtein(col("a"), col("b")), lit(51)).as("capped"))
      .collect()
    rows.length should be > 0
    rows.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }
}
