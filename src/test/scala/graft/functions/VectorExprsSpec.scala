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

  test("native QuantizeError equals the transform/aggregate HOF form") {
    val dim = 64
    val emb = spark.read.parquet(s"${SparkSpec.Sf0001}/embeddings.parquet")
      .select(col("vec_id"), scaled(col("embedding")).as("sv"))
    val statAggs = (0 until dim).map(i => min(element_at(col("sv"), i + 1)).as(s"mn$i")) ++
      (0 until dim).map(i => max(element_at(col("sv"), i + 1)).as(s"mx$i"))
    val lists = emb.agg(statAggs.head, statAggs.tail: _*).select(
      array((0 until dim).map(i => col(s"mn$i")): _*).as("mins"),
      array((0 until dim).map(i => col(s"mx$i") - col(s"mn$i")): _*).as("rngs"))
    // q58's original interpreted formulation, kept here as the spec oracle.
    val errPerDim = transform(sequence(lit(1), lit(dim)), i => {
      val d = element_at(col("sv"), i) - element_at(col("mins"), i)
      val r = element_at(col("rngs"), i)
      val num = d * lit(255L)
      val qz = ((num - num % r) / r).cast("long")
      val t = qz * r
      val recon = ((t - t % lit(255L)) / lit(255L)).cast("long")
      when(r === 0L, lit(0L)).otherwise(abs(d - recon))
    })
    val both = emb.crossJoin(broadcast(lists)).select(
      VectorExprs.quantErr(col("sv"), col("mins"), col("rngs")).as("native"),
      aggregate(errPerDim, lit(0L), (acc, x) => acc + x).as("hof"))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0L
    both.count() shouldBe 500L
  }

  test("QuantizeError null propagation, zero-range dims, SQL callability") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(
      // d = (9, 0); r = (4, 0): dim0 q=⌊9·255/4⌋=573, recon=⌊573·4/255⌋=8 → err 1
      (Some(Seq(10L, 7L)), Some(Seq(1L, 7L)), Some(Seq(4L, 0L))),
      (None, Some(Seq(0L)), Some(Seq(1L))))
      .toDF("sv", "mins", "rngs")
    val out = df.select(VectorExprs.quantErr(col("sv"), col("mins"), col("rngs")).as("e"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    out shouldBe Array(1L, null)
    spark.sql("SELECT graft_quant_err(array(10L, 7L), array(1L, 7L), array(4L, 0L)) AS e")
      .collect().head.getLong(0) shouldBe 1L
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
