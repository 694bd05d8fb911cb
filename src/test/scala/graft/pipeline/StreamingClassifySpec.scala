package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The reference's batch job as a continuous pipeline: `Infer.classify`
  * is source-agnostic (a `mapPartitions` over a typed Dataset), so the
  * SAME code that runs the batch manifest runs online inference on a
  * stream — swap `spark.read` for `readStream` and nothing else. Golden:
  * streaming output must equal the batch run over the same items. */
class StreamingClassifySpec extends AnyFunSuite with SparkSpec with Matchers {

  test("Infer.classify on a stream equals the batch run (same scorer, same items)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val labels = LabelDict(graft.operators.Pipeline.Labels)
    val scorer = new HashScorer(labels.size)
    val items = (1 to 100).map(i => Item(s"/data/doc$i.jpg", s"document body $i")) :+
      Item("/data/blank.jpg", "   ") // sentinel path must work mid-stream too

    val batch = Infer.classify(items.toDS(), scorer, labels).collect()
      .map(p => (p.path, p.label, p.prob)).toSet

    val in = MemoryStream[Item]
    val q = Infer.classify(in.toDS(), scorer, labels)
      .writeStream.format("memory").queryName("online_preds")
      .outputMode(OutputMode.Append()).start()
    try {
      // Feed in two micro-batches to exercise repeated per-partition init.
      in.addData(items.take(40))
      q.processAllAvailable()
      in.addData(items.drop(40))
      q.processAllAvailable()
      val streamed = spark.table("online_preds").as[Prediction].collect()
        .map(p => (p.path, p.label, p.prob)).toSet
      streamed shouldBe batch
      streamed.find(_._1 == "/data/blank.jpg").get._3 shouldBe 0.0 // sentinel
    } finally q.stop()
  }
}
