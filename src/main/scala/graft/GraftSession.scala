package graft

import org.apache.spark.sql.SparkSession

/** The recommended session builder for library users: graft's Catalyst
  * extensions pre-registered (so `graft_dot`/`graft_edit_within`/
  * `graft_minhash` work from SQL immediately), UTC session time zone
  * (cross-engine-deterministic timestamps), and shuffle parallelism
  * matched to cores instead of Spark's default 200 (right-sizes the
  * local/bench path; on a cluster pass the executor-core total, or drop
  * the setting and let AQE coalesce).
  *
  * `spark.files.overwrite=true` because the artifact lifecycle here
  * re-ships refreshed files under stable names: a long-lived session
  * that runs `Monitor`/`Main` twice with a retrained `model.gcm` (or
  * re-ships a revised `--pipe` script) must serve the NEW artifact —
  * Spark's default instead fails EVERY subsequent task in the session
  * with "file exists and does not match contents", poisoning work that
  * never touched the artifact.
  *
  * `GraftSession.builder().getOrCreate()` is all a user needs; the
  * engine's own mains (`Verify`, `Bench`, `Explain`) build through it so
  * the documented path is the tested path.
  */
object GraftSession {

  def builder(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      local: Boolean = true): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.files.overwrite", "true")
      .config("spark.ui.enabled", "false")
      // FAIR across scheduler pools: batch work keeps FIFO semantics
      // (everything lands in one default pool), while the serving path
      // assigns each request thread its own pool
      // (sc.setLocalProperty("spark.scheduler.pool", …)) so concurrent
      // probes interleave stage-by-stage instead of queuing behind
      // whichever request submitted first — the round-14 serveconc
      // saturation was requests serializing through FIFO.
      .config("spark.scheduler.mode", "FAIR")
      // Round-15 drift root-cause (BENCH_NOTES r15): Spark's Janino
      // codegen cache defaults to 100 entries; a multi-hundred-query
      // session generates thousands of distinct codegen classes per
      // sweep, so EVERY re-execution recompiled its whole plan
      // (measured: 17,068 blocking compiles × ~11-14 ms across a
      // 3-pass 249-query suite = ~30% of total wall, and the per-
      // compile cost itself grows with loaded-class pressure — the
      // uniform round-over-round "drift" on untouched plans). 10k
      // entries holds the whole surface: same suite re-measured
      // 176.4 s → 123.2 s, compiles 17,068 → 3,890. Static conf, so
      // it must be set at session creation. An explicit -D system
      // property wins (drift_probe.sh reruns the pre-fix regime and
      // CodegenCacheSpec's negative control forks it at 100) — builder
      // .config would otherwise silently shadow the experiment pin.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.props.getOrElse("spark.sql.codegen.cache.maxEntries", "10000"))
      // Round-17 semguard root-cause: ObjectHashAggregateExec falls
      // back to SORT-based aggregation once its hash map holds more
      // than this many keys — Spark's default is 128, so every
      // TypedImperativeAggregate groupBy in this engine (graft_topk,
      // graft_argmax, minhash signatures, Misra-Gries) was silently
      // SORTING its whole input beyond 128 groups per task. Invisible
      // to the plan census (the fallback never appears as a
      // SortAggregate node) and fatal at scale: the ×400 semantic-dedup
      // degree-budget heap sorted a 7.4·10⁹-row candidate stream to
      // disk (~60 GB spill → ENOSPC) instead of collapsing each a_id
      // map-side. 500k keys/task keeps the documented map-side-combine
      // posture truthful; per-task memory stays bounded by keys/task ×
      // buffer size (the engine's biggest buffer is argmax's ~0.5 KB
      // carried vector — 25k keys/task at the ×400 corpus ≈ 13 MB).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.props.getOrElse(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "500000"))
    if (local) b.master(s"local[$cores]") else b
  }
}
