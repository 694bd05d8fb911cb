package graft.tools

/** Codegen-cache regression probe (round-15 verdict task 2's pin).
  *
  * Round 15's single biggest perf win was one static conf:
  * `spark.sql.codegen.cache.maxEntries=10000` in [[graft.GraftSession]]
  * (Spark's default 100-entry Janino cache thrashed under the
  * multi-hundred-query surface — 17,068 blocking recompiles ≈ 30% of
  * suite wall). This main is the machine check that the conf is still
  * live: it builds a session THROUGH GraftSession (the same path every
  * engine CLI takes), runs a ~20-query probe surface three times, and
  * prints per-pass Janino compile counts from Spark's own
  * CodegenMetrics.
  *
  * Expected shape under the shipped conf: pass 0 compiles everything
  * (plans + the memoized feature frames' cache-build plans), passes 1–2
  * are ~zero — every re-execution re-generates byte-identical source
  * and hits the cache. Under the pre-fix 100-entry cache the probe
  * surface alone exceeds the cache, and a sequential scan over an LRU
  * larger than its capacity hits NOTHING — passes 1–2 recompile at
  * pass-0 scale. `CodegenCacheSpec` forks this main twice (default and
  * `-Dspark.sql.codegen.cache.maxEntries=100`) and asserts both shapes,
  * so reverting the GraftSession conf turns the suite red.
  *
  * Output: one JSON line
  * `{"metric":"codegen_probe","cache_max":…,"pass0":…,"pass1":…,"pass2":…}`.
  */
object CodegenProbe {

  /** Probe surface: a cross-family mix big enough that one pass
    * generates well over 100 distinct codegen classes (the pre-fix
    * cache capacity) while staying cheap at sf0.001. */
  val ProbeQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier",
    "q07_window_topk", "q09_segment_stats", "q11_rollup_flags",
    "q13_order_count_dist", "q15_top_supplier", "q30_token_stats",
    "q34_content_dedup", "q35_minhash_lsh", "q38_cosine_topk",
    "q57_tfidf_terms", "q63_funnel_daily", "q80_repetition",
    "q86_bm25", "q89_quality_gate", "q110_dup_histogram",
    "q134_topk_agg", "q141_bigram_lm")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    val metric =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    def pass(): Long = {
      val c0 = metric.getCount
      // Row contents are the oracle gate's business — the probe only
      // needs each plan EXECUTED so its generated classes hit (or miss)
      // the Janino cache. Executed via the NOOP SINK, the bench's own
      // action: a write plans a fresh QueryExecution per call, so every
      // pass re-generates (byte-identical) source and exercises the
      // Janino cache. `.collect()` would instead reuse the plan-memoized
      // Dataset's one QueryExecution — its AQE stages stay materialized
      // and re-passes compile ~nothing in BOTH forks, nulling the
      // negative control (observed when the r17 plan memo landed).
      ProbeQueries.foreach(n =>
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save())
      metric.getCount - c0
    }
    val p0 = pass(); val p1 = pass(); val p2 = pass()
    // Stdout contract: ONE parseable line (the Bench discipline).
    println(s"""{"metric":"codegen_probe","cache_max":""" +
      s""""${spark.conf.get("spark.sql.codegen.cache.maxEntries")}",""" +
      s""""queries":${ProbeQueries.size},"pass0":$p0,"pass1":$p1,"pass2":$p2}""")
    graft.operators.Features.clear(spark)
    spark.stop()
  }
}
