package graft.tools

/** Per-query phase breakdown (optimization-round measurement tool).
  *
  * For each named query, times three phases separately, N repetitions
  * in one warm JVM:
  *   - build: DataFrame construction (driver-side expression-tree work)
  *   - plan:  analysis + optimization + physical planning
  *     (`queryExecution.executedPlan` forced)
  *   - exec:  the noop-sink write (the number Bench reports includes
  *     all three, since Bench re-builds the frame per pass)
  *
  * Prints one JSON line per query with the min across repetitions of
  * each phase, so "is the suite paying Catalyst or the cluster?" is a
  * measurement instead of a guess.
  *
  * Usage: `runMain graft.tools.PhaseProbe <sfDir> <reps> <name...>`
  * (names may be prefixes, matching Bench's SPARK_GRAFT_BENCH_NAMES).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val pats = args.drop(2).toSeq
    val spark = graft.GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.isEmpty || pats.exists(p => n == p || n.startsWith(p)))
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    // Warmup: one full run of each so codegen/JIT is charged up front.
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"$n warmup: $e") }
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val runs = (1 to reps).map { _ =>
        val (tb, df) = t(fn(spark, dir))
        val (tp, _) = t(df.queryExecution.executedPlan)
        val (te, _) = t(df.write.format("noop").mode("overwrite").save())
        (tb, tp, te)
      }
      def m(f: ((Double, Double, Double)) => Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(runs.map(f).min))
      println(s"""{"q":"$n","build":${m(_._1)},"plan":${m(_._2)},""" +
        s""""exec":${m(_._3)}}""")
    }
    spark.stop()
  }
}
