package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Per-query job/stage anatomy (optimization-round measurement tool).
  *
  * Runs each named query warm (2 untimed runs), then once instrumented:
  * a listener records every job and stage the action triggers — stage
  * wall (submission→completion), task count, and the executor-side task
  * time sum. Output (one JSON line per query) answers the question the
  * wall-clock alone cannot: is the time going to real executor work, or
  * to the per-stage fixed costs (driver re-planning between AQE stages,
  * scheduling, codegen) that multiply with Exchange count?
  *
  * Usage: `runMain graft.tools.StageProbe <sfDir> <name-or-prefix...>`
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val pats = args.drop(1).toSeq
    val spark = graft.GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.isEmpty || pats.exists(p => n == p || n.startsWith(p)))

    case class St(var wallMs: Long = 0, var tasks: Int = 0,
      var taskMs: Long = 0, var submitted: Long = 0)
    val stages = mutable.Map[Int, St]()
    var jobs = 0
    var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) jobs += 1
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (record) stages.getOrElseUpdate(e.stageInfo.stageId, St())
          .submitted = System.nanoTime()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) stages.get(e.stageInfo.stageId).foreach { s =>
          s.wallMs = (System.nanoTime() - s.submitted) / 1000000
          s.tasks = e.stageInfo.numTasks
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (record) stages.get(e.stageId).foreach { s =>
          if (e.taskMetrics != null)
            s.taskMs += e.taskMetrics.executorRunTime
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Unit = fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      try {
        run(); run() // warm: codegen + memoized frames charged here
        stages.clear(); jobs = 0
        record = true
        val t0 = System.nanoTime()
        run()
        val wall = (System.nanoTime() - t0) / 1e9
        // Listener bus is async: poll until the recorded stage set has
        // quiesced (listenerBus.waitUntilEmpty is private[spark]).
        var last = -1
        var same = 0
        while (same < 3) {
          Thread.sleep(50)
          val now = stages.size * 10000 + stages.valuesIterator.map(_.tasks).sum
          if (now == last) same += 1 else { same = 0; last = now }
        }
        record = false
        val ss = stages.values.toSeq
        val stageWall = ss.map(_.wallMs).sum / 1e3
        val taskSum = ss.map(_.taskMs).sum / 1e3
        val maxStage = if (ss.isEmpty) 0.0 else ss.map(_.wallMs).max / 1e3
        println(String.format(java.util.Locale.ROOT,
          """{"q":"%s","wall":%.3f,"jobs":%d,"stages":%d,""" +
            """"stage_wall_sum":%.3f,"task_time_sum":%.3f,""" +
            """"max_stage_wall":%.3f,"tasks":%d}""",
          n, Double.box(wall), Int.box(jobs), Int.box(ss.size),
          Double.box(stageWall), Double.box(taskSum),
          Double.box(maxStage), Int.box(ss.map(_.tasks).sum)))
        if (sys.env.get("STAGEPROBE_DETAIL").contains("1"))
          stages.toSeq.sortBy(-_._2.taskMs).take(12).foreach { case (id, s) =>
            println(String.format(java.util.Locale.ROOT,
              """  {"stage":%d,"wall_ms":%d,"tasks":%d,"task_ms":%d}""",
              Int.box(id), Long.box(s.wallMs), Int.box(s.tasks),
              Long.box(s.taskMs)))
          }
      } catch { case e: Throwable =>
        record = false
        System.err.println(s"[stageprobe] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
