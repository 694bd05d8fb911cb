package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts DISTINCT SQL execution ids started while a block runs — the
  * shared harness behind every "exactly N driver actions" contract spec
  * (Bpe's 1+2·rounds budget, kmeansAuto's one-action-per-round loop,
  * ccLabelsAuto's hop budget, the memoized audit-stage build-once pin).
  *
  * Counting execution ids, not jobs: AQE legitimately splits one action
  * into several jobs, so job counts are not a stable contract surface.
  *
  * Listener delivery is async, so after `body` returns we DRAIN the
  * listener bus (`LiveListenerBus.waitUntilEmpty`, reached via
  * reflection — it is `private[spark]`) instead of polling until the
  * count "looks stable": on a loaded host a fixed-stability poll can
  * declare victory while a job-start event is still queued, silently
  * undercounting. Draining is deterministic — the bus is empty or the
  * wait throws.
  */
object SqlActionCounter {

  /** Run `body`, returning (result, distinct SQL execution ids started
    * during the run). The listener is removed before returning. */
  def countedSqlExecutions[A](spark: SparkSession)(body: => A): (A, Int) = {
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = js.properties
        val id = if (p == null) null else p.getProperty("spark.sql.execution.id")
        if (id != null) execIds.add(id)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = body
      drainListenerBus(spark)
      (result, execIds.size)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Block until every queued listener event has been delivered.
    * `SparkContext.listenerBus` and `waitUntilEmpty` are
    * `private[spark]`, which compiles to public bytecode — plain
    * reflection reaches them without forging package membership. */
  def drainListenerBus(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    val methods = bus.getClass.getMethods.filter(_.getName == "waitUntilEmpty")
    methods.find(_.getParameterCount == 0) match {
      case Some(m) => m.invoke(bus)
      case None =>
        methods.find(_.getParameterCount == 1) match {
          case Some(m) => m.invoke(bus, java.lang.Long.valueOf(30000L))
          case None =>
            sys.error("LiveListenerBus.waitUntilEmpty not found — Spark internals moved")
        }
    }
  }
}
