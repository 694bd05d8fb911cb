package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** PRODUCT-ANALYTICS REPORT CLI — the event-analytics counterpart of
  * `Curate --with-audit`: one command ships the standing session
  * report a product/growth team reads daily, every panel produced by
  * EXACTLY the oracled query of the same name (`<out>/<query>/`, one
  * JSON file each), so the shipped report can never drift from the
  * audited surface:
  *
  *   - `q202_growth_accounting` — the daily lifecycle ledger
  *     (new/retained/resurrected/churned);
  *   - `q192_entry_sessions`    — which doors are worth the traffic;
  *   - `q203_session_funnel`    — strict-order step conversion;
  *   - `q206_conversion_latency`— how long the converting leg takes;
  *   - `q205_seq_support`       — what follows what (funnel discovery);
  *   - `q207_dwell_share`       — where session time actually goes;
  *   - `q200_period_scan`       — the feed's period structure;
  *   - `q201_cadence_cv`        — arrival dispersion (bot signature);
  *   - `q208_entry_exit`        — the landing→leaving matrix + bounce;
  *   - `q194_survival`          — censoring-aware retention hazard.
  *
  * Same contract as the reference driver and the sibling CLIs
  * (`java/PredictDriverCluster.java:42-43` output-dir discipline):
  * the output directory must not exist; exit 0/1.
  *
  * Scale posture: the session-rooted panels share ONE memoized
  * sessionized build ([[graft.operators.Events.sessionized]]), so the
  * whole report costs one corpus window stack plus bounded
  * re-aggregates — the point of shipping them as one command. */
object Insights {

  val Panels: Seq[String] = Seq(
    "q202_growth_accounting", "q192_entry_sessions", "q203_session_funnel",
    "q206_conversion_latency", "q205_seq_support", "q207_dwell_share",
    "q200_period_scan", "q201_cadence_cv", "q208_entry_exit",
    "q194_survival",
    // round-13 panels: paths, return latency, depth-by-door, cohort
    // triangle, value deciles, error streaks, gap tails — same
    // one-definition contract (each panel IS its oracled query)
    "q210_session_paths", "q211_return_latency", "q212_depth_by_entry",
    "q216_weekly_cohorts", "q217_ltv_deciles", "q221_error_streaks",
    "q223_gap_tail_quantiles", "q229_entry_value",
    // round-14 panels: capacity sizing + concentration
    "q235_peak_concurrency", "q236_user_gini")

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Panels.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.json(s"$outDir/$name")
    }

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Insights <sf_dir> <out_dir>")
      sys.exit(1)
    }
    val (sfDir, outDir) = (args(0), args(1))
    if (Files.exists(Paths.get(outDir))) {
      System.err.println(s"graft.Insights: output dir exists: $outDir")
      sys.exit(1)
    }
    val spark = GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Exit-code decided inside, exit CALLED after cleanup: sys.exit
    // inside the try would unwind past the finally (JVM terminates
    // before Features.clear/spark.stop run).
    val status =
      try {
        run(spark, sfDir, outDir)
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"graft.Insights: ${e.getMessage}")
          1
      } finally {
        graft.operators.Features.clear(spark)
        spark.stop()
      }
    sys.exit(status)
  }
}
