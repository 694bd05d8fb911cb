package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Pipeline

class InferSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val labels = LabelDict(Pipeline.Labels)

  test("typed HashScorer pipeline agrees with oracle-checked q27 exactly") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${SparkSpec.Sf0001}/documents.parquet")
    val items = docs.select(
        concat(lit("/user/data/"), col("source"), lit("/doc "),
          col("doc_id").cast("string"), lit(".jpg")).as("path"),
        col("text").as("payload"))
      .as[Item]

    val typed = Infer.classify(items, new HashScorer(labels.size), labels)
      .collect().map(p => p.path -> ((p.label, p.prob))).toMap

    val declarative = Pipeline.queries("q27_classify_stub")(spark, SparkSpec.Sf0001)
      .select(col("path"), col("label"), col("prob"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap

    typed.size shouldBe declarative.size
    typed shouldBe declarative
  }

  test("per-item failure emits the reference sentinel (labels(0), 0.0)") {
    import spark.implicits._
    val items = Seq(Item("a", "hello"), Item("b", "   "), Item("c", "")).toDS()
    val acc = spark.sparkContext.longAccumulator("sentinels")
    val out = Infer.classify(items, new HashScorer(labels.size), labels,
        sentinels = Some(acc))
      .collect().map(p => p.path -> p).toMap

    out("b").label shouldBe Pipeline.Labels.head
    out("b").prob shouldBe 0.0
    out("c").label shouldBe Pipeline.Labels.head
    acc.value shouldBe 2L
  }

  test("tail batch is flushed (B1): every row scored at any batch size") {
    import spark.implicits._
    val n = 101 // deliberately not a multiple of the batch size
    val items = (1 to n).map(i => Item(s"p$i", s"payload $i")).toDS().repartition(3)
    val out = Infer.classify(items, new HashScorer(labels.size), labels,
      batchSize = 8).collect()
    out.length shouldBe n
    out.map(_.path).toSet shouldBe (1 to n).map(i => s"p$i").toSet
  }
}
