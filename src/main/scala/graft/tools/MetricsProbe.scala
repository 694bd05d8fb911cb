package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Operator-level profile (optimization-round measurement tool): runs
  * each named query once warm, then walks the EXECUTED (AQE-final)
  * physical plan printing every node with its populated SQL metrics —
  * rows out, aggregate/join/scan times — the data the Spark UI SQL tab
  * would show, on stdout. This maps wall-clock to OPERATORS where
  * StageProbe only maps it to stages.
  *
  * Usage: `runMain graft.tools.MetricsProbe <sfDir> <name-or-prefix...>`
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pats = args.drop(1).toSeq
    val spark = graft.GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.isEmpty || pats.exists(p => n == p || n.startsWith(p)))

    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.toSeq
        .filter { case (k, m) => m.value > 0 &&
          (k.contains("numOutputRows") || k.contains("time") ||
            k.contains("Time") || k.contains("build") ||
            k.contains("numFiles") || k.contains("dataSize")) }
        .map { case (k, m) => s"$k=${m.value}" }.sorted.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + interesting)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try {
        // Warm runs: memoized frames + codegen charged outside the probe.
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val df = fn(spark, dir)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(String.format(java.util.Locale.ROOT,
          "==== %s wall=%.3f", n, Double.box(wall)))
        // The noop write runs through its own QueryExecution; the
        // memoized df's own executedPlan is the same AQE tree only if
        // we drive it ourselves — execute once more and read metrics
        // off the driven tree.
        val qe = df.queryExecution
        qe.executedPlan.execute().foreach(_ => ())
        walk(qe.executedPlan, 1)
      } catch { case e: Throwable =>
        System.err.println(s"[metricsprobe] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
