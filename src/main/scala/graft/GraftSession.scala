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
    if (local) b.master(s"local[$cores]") else b
  }
}
