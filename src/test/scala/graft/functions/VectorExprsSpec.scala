package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class VectorExprsSpec extends AnyFunSuite with SparkSpec with Matchers {

  VectorExprs.ensureRegistered(SparkSpec.session)

  private def scaled(c: org.apache.spark.sql.Column) =
    transform(c, x => floor(x.cast("double") * 10000.0).cast("long"))

  test("native LongDotProduct equals the zip_with/aggregate HOF form") {
    val emb = spark.read.parquet(s"${SparkSpec.Sf0001}/embeddings.parquet")
      .select(col("vec_id"), scaled(col("embedding")).as("sv"))
    val hof = aggregate(zip_with(col("sv"), col("sv"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val both = emb.select(col("vec_id"),
      VectorExprs.dotL(col("sv"), col("sv")).as("native"), hof.as("hof"))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0L
    both.count() shouldBe 500L
  }

  test("null array input yields null, empty arrays yield 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))),
      (None, Some(Seq(1L))),
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])))
      .toDF("a", "b")
    val out = df.select(VectorExprs.dotL(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    out shouldBe Array(32L, null, 0L)
  }

  test("graft_dot is SQL-callable via GraftExtensions registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1L, 2L), array(10L, 20L)) AS d")
      .collect().head.getLong(0)
    r shouldBe 50L
  }

  test("whole-stage codegen covers the dot-product projection") {
    val emb = spark.read.parquet(s"${SparkSpec.Sf0001}/embeddings.parquet")
      .select(scaled(col("embedding")).as("sv"))
      .select(VectorExprs.dotL(col("sv"), col("sv")).as("n2"))
    // `*(n)` prefixes mark operators inside WholeStageCodegen span n.
    val plan = emb.queryExecution.executedPlan.toString
    val dotLine = plan.linesIterator.find(_.contains("longdotproduct")).get
    dotLine.trim should startWith("*(")
  }
}
