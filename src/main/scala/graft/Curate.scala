package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Features, TextAnalysis}

/** End-to-end corpus curation CLI — the data-pipeline twin of
  * [[Main]]'s classification job: read a documents table, run the full
  * curation funnel (text dedup → semantic dedup → decontamination →
  * weighted mixing, exactly the decisions q78/q84 report), and SHIP the
  * result:
  *
  *   <out>/corpus/split=train|val|test/  — surviving documents as
  *     parquet, partitioned by the content-stable split assignment
  *     (q83's rule stamped as a partition column at write time — the
  *     zero-cost place to assign it);
  *   <out>/report/                       — the per-source funnel (q84)
  *     as a single JSON file: the audit record of what was dropped
  *     where, written ALONGSIDE the corpus it describes;
  *   <out>/manifest/                     — q151's corpus-version
  *     manifest of the SHIPPED corpus ([[ManifestWriter]]), the
  *     |sources|-row fingerprint the next run diffs against
  *     (q153's production shape) to decide what needs rebuilding.
  *
  * Usage: `graft.Curate <sf_dir> <out_dir> [--with-quality] [--with-dsir]
  * [--with-shards] [--with-tombstones] [--with-ledger]
  * [--with-audit] [--reconcile <stored_ledger_dir>]`
  *
  * `--with-audit` ships the corpus-HEALTH panel alongside the corpus
  * (`<out>/audit/<query>/`, one JSON file each): length-distribution
  * drift in earth-mover units (q176), token-level novelty forecast
  * (q177 Good–Turing), term burstiness (q179), crawl-run duplication
  * (q180), the confident-learning label-noise joint (q175),
  * chance-corrected label agreement (q186 kappa), the serving
  * risk–coverage curve (q187), Simpson token concentration (q190),
  * bigram conditional entropy (q197 — template predictability
  * collapse), and the length↔richness Spearman correlation (q198) —
  * the release-gate numbers a corpus consumer reads BEFORE training,
  * produced by exactly the oracled queries so the shipped panel can
  * never drift from the audited surface.
  *
  * `--with-ledger` additionally ships the doc-granularity fingerprint
  * ledger (`<out>/ledger/`, q159's stored side via
  * [[ManifestWriter.writeLedger]]) so the next run can extract its
  * changed-document work-list without re-reading this corpus.
  *
  * `--with-buckets` additionally ships `<out>/corpus_bucketed/` — the
  * curated documents and their embeddings as id-BUCKETED, id-sorted
  * parquet ([[CurateBuckets]] buckets each) plus the `REGISTER.sql`
  * DDL that re-declares the bucketing to a consumer's catalog. A
  * consumer who registers both tables gets every cross-modal
  * vec_id↔doc_id join (q97/q114/q126's only corpus-sized operation)
  * WITHOUT a shuffle exchange on either side — at 100 TB the
  * difference between a network-bound and a scan-bound join
  * (`CurateBucketsSpec` reads a shipped corpus back and pins the
  * exchange-free plan).
  *
  * `--reconcile <stored_ledger_dir>` closes the release-to-release
  * loop: the SHIPPED corpus is diffed against a previous run's
  * `--with-ledger` artifact (q159's full classification via
  * [[ManifestWriter.deltaAgainstStoredLedger]]) and the per-(source,
  * status) report ships as `<out>/report_reconcile/`. This is the
  * production trigger for the `removed` class — the one leg the
  * streaming monitor ([[graft.streaming.DeltaStreams]]) structurally
  * cannot see, because absence never arrives on a stream: a document
  * that shipped last release but not this one (dropped upstream, newly
  * tombstoned, or newly funnel-rejected) shows up here, with exact
  * char deltas. One fingerprint-sized full-outer join; neither
  * release's payload bytes are re-read.
  *
  * `--with-tombstones` applies the standing deletion set (q139's
  * `% 23` stand-in for an uploaded takedown list) end-to-end:
  * tombstoned ids are a HARD filter (never shipped), both cluster
  * tables re-elect orphaned canonicals to the minimum surviving id
  * (q140's rule via `funnelFlagsTombstonedOver` — the corpus ships AS
  * IF the deleted docs never existed, so content whose keeper was
  * deleted ships through its re-elected twin), and the q139
  * blast-radius audit ships as `<out>/report_tombstones/`.
  *
  * `--with-shards` additionally executes q111's epoch-shuffle plan over
  * the SHIPPED corpus via [[ShardWriter]]: `<out>/shards/epoch=E/
  * shard=S/` manifests (doc_id + n_tokens per epoch), the artifact each
  * epoch's data-loader reads shard-by-shard. Written after the corpus
  * so the manifests describe exactly what shipped.
  *
  * `--with-dsir` appends q107's targeted selection as the final stage
  * (only target-affine survivors ship, per the frozen log-ratio
  * artifact) and writes the per-source selection counts as
  * `<out>/report_dsir/` alongside the funnel report.
  *
  * `--with-quality` prepends the composite quality gate (q89: length /
  * repetition / LM-surprisal against the corpus-frozen LM) as stage
  * one — the q92 chain. The shipped report is then the extended
  * 6-stage funnel (q92) instead of the per-source q84 breakdown, so
  * the audit record always describes the pipeline that actually ran.
  *
  * REPRESENTATIVE-LOSS SEMANTICS of `--with-quality`: stage flags are
  * computed INDEPENDENTLY on the full corpus and composed by
  * conjunction. Dedup keeps each cluster's minimum doc_id; if that
  * representative is quality-rejected, its duplicates are STILL
  * dropped by the dedup stage — all copies of that content vanish
  * rather than a surviving duplicate being re-elected keeper. This is
  * deliberate: content whose canonical copy fails the quality gate is
  * (by construction of near-duplication) the same low-quality content
  * under every label, so re-electing a twin would readmit what the
  * gate rejected; and independent per-stage flags are what make the
  * funnel report auditable (each stage's drop count has one meaning)
  * and the flag tables memoizable. A pipeline that wants
  * quality-filtered dedup INSTEAD (labels derived over quality
  * survivors only) should gate first and run the funnel on the
  * gated table — the operators compose in either order.
  *
  * Contracts shared with [[Main]] (the reference's driver shape,
  * `/root/reference/java/PredictDriverCluster.java`): the output
  * directory must not exist (Hadoop FileOutputFormat), usage errors and
  * job failures exit 1, success exits 0.
  *
  * Scale posture: the funnel decisions ride the memoized flag stage
  * (built once per session); the only full-corpus pass is the final
  * write, a broadcast semi-join of the survivor-id set against the
  * documents scan followed by a partitioned parquet write — no shuffle
  * of document payloads except the partitionBy split (3 buckets,
  * stamped from a stateless per-row hash). */
object Curate {

  private val Usage =
    "Usage: graft.Curate <sf_dir> <out_dir> [--with-quality] " +
      "[--with-dsir] [--with-shards] [--with-tombstones] " +
      "[--with-ledger] [--with-audit] [--with-buckets] " +
      "[--reconcile <stored_ledger_dir>]"

  /** The `--with-audit` release-gate panel: every member is an oracled
    * query, so the shipped artifact is the audited surface verbatim. */
  val AuditPanel: Seq[String] = Seq(
    "q176_emd_drift", "q177_good_turing", "q179_burstiness",
    "q180_crawl_runs", "q175_label_noise", "q181_noise_by_source",
    "q182_confidence_drift", "q183_trust_panel",
    // round-12 legs: chance-corrected label agreement, the serving
    // operating curve, and the zero-float concentration early-warning
    "q186_source_kappa", "q187_risk_coverage", "q190_simpson",
    // round-12 text-order legs: predictability collapse (template
    // floods) and the length↔richness joint the marginals can't see
    "q197_cond_entropy", "q198_rank_corr")

  def main(args: Array[String]): Unit = {
    // --reconcile carries a value; peel the pair off before the
    // boolean-flag partition.
    val rIdx = args.indexOf("--reconcile")
    val (reconcileLedger, rest) =
      if (rIdx < 0) (None, args)
      else if (rIdx + 1 >= args.length || args(rIdx + 1).startsWith("--")) {
        System.err.println(Usage)
        sys.exit(1)
        (None, args) // unreachable
      } else (Some(args(rIdx + 1)), args.patch(rIdx, Nil, 2))
    val (flags, positional) = rest.partition(_.startsWith("--"))
    val withQuality = flags.contains("--with-quality")
    val withDsir = flags.contains("--with-dsir")
    val withShards = flags.contains("--with-shards")
    val withTombstones = flags.contains("--with-tombstones")
    val withLedger = flags.contains("--with-ledger")
    val withAudit = flags.contains("--with-audit")
    val withBuckets = flags.contains("--with-buckets")
    if (positional.length != 2 ||
        !flags.forall(f => f == "--with-quality" || f == "--with-dsir" ||
          f == "--with-shards" || f == "--with-tombstones" ||
          f == "--with-ledger" || f == "--with-audit" ||
          f == "--with-buckets")) {
      System.err.println(Usage)
      sys.exit(1)
    }
    val (sfDir, outDir) = (positional(0), positional(1))
    val spark = GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Exit-code decided inside, exit CALLED after cleanup: sys.exit
    // inside the try would unwind past the finally (JVM terminates
    // before Features.clear/spark.stop run).
    val status =
      try {
        run(spark, sfDir, outDir, withQuality, withDsir, withShards,
          withTombstones, withLedger, reconcileLedger, withAudit,
          withBuckets)
        0
      } catch {
        case e: Throwable =>
          System.err.println(s"[curate] failed: ${e.getMessage}")
          1
      } finally {
        Features.clear(spark)
        spark.stop()
      }
    sys.exit(status)
  }

  /** The job body, separated from the exit-code shell for specs. */
  private[graft] def run(spark: SparkSession, sfDir: String,
      outDir: String, withQuality: Boolean = false,
      withDsir: Boolean = false, withShards: Boolean = false,
      withTombstones: Boolean = false,
      withLedger: Boolean = false,
      reconcileLedger: Option[String] = None,
      withAudit: Boolean = false,
      withBuckets: Boolean = false): Unit = {
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath))
      throw new IllegalStateException(s"output directory already exists: $outDir")

    // Stamp the keep-chain onto the FULL document rows: the stage
    // tables broadcast, so payload bytes stream scan → filter → write
    // with no shuffle (the funnel-flag cache holds only narrow flags —
    // joining survivors back against it would shuffle the corpus).
    // --with-quality adds the q92 prefix the same way: one more
    // broadcast left anti-shape join (the memoized REJECT set).
    // --with-tombstones: the right-to-be-forgotten path. Two effects,
    // deliberately separate: (1) the HARD filter — tombstoned ids never
    // reach any downstream stage or the shipped corpus; (2) the
    // DERIVED-decision repair — both cluster tables re-elect each
    // orphaned cluster's canonical to its minimum surviving id (q140's
    // rule via funnelFlagsTombstonedOver), so content whose keeper was
    // deleted ships through its re-elected twin instead of vanishing.
    // The blast-radius audit (q139) ships alongside as the compliance
    // record of what the takedown touched.
    val allDocs = Tables.documents(spark, sfDir)
    val baseDocs =
      if (!withTombstones) allDocs
      else allDocs.filter(col("doc_id") % Dedup.DeleteMod =!= 0)
    val flagged =
      if (!withTombstones) Dedup.funnelFlagsOver(baseDocs, spark, sfDir)
      else Dedup.funnelFlagsTombstonedOver(baseDocs, spark, sfDir)
    val gated =
      if (!withQuality) flagged
      else flagged.join(broadcast(Dedup.qualityRejects(spark, sfDir)),
          col("doc_id") === col("q_id"), "left")
        .filter(col("q_id").isNull).drop("q_id")
    // --with-dsir appends targeted selection as the LAST stage: only
    // funnel survivors that the frozen DSIR artifact scores target-
    // affine ship (q107's decisions, a broadcast semi join of the
    // selected-id set — ids only, payloads never shuffle). Selection
    // runs after dedup/decontamination on purpose: importance weights
    // are per-content, so deduping first cannot change any surviving
    // document's score, and decontaminating first keeps eval leaks
    // out of the shipped corpus regardless of their affinity.
    val dsirScored =
      if (!withDsir) None
      else Some(TextAnalysis.dsirScores(Tables.documents(spark, sfDir),
        TextAnalysis.dsirLrTable(spark, sfDir)))
    val selected = dsirScored.fold(gated) { scored =>
      gated.join(broadcast(scored.filter(col("decision") === "selected")
        .select(col("doc_id").as("d_id"))),
        col("doc_id") === col("d_id"), "left_semi")
    }
    val curated = selected
      .filter(col("k4")).drop("k1", "k2", "k3", "k4")
      .withColumn("split", TextAnalysis.splitAssign)
    curated.write.partitionBy("split").parquet(s"$outDir/corpus")

    // --with-shards: execute q111's epoch-shuffle plan over what
    // actually shipped — per-epoch (doc_id, n_tokens) manifests the
    // loader reads shard-by-shard (coalesced: manifest rows are tiny,
    // one file per cell is the loader-friendly layout).
    if (withShards)
      ShardWriter.write(spark, curated, s"$outDir/shards",
        coalesceFiles = true)

    // The corpus-version manifest (q151's fingerprint of what SHIPPED)
    // always rides along: the next run diffs its live corpus against
    // this |sources|-row artifact (ManifestWriter.diffAgainstStored,
    // q153's production shape) to decide per source whether anything
    // needs rebuilding — without re-reading this corpus' bytes.
    ManifestWriter.write(curated, s"$outDir/manifest")

    // --with-ledger: the manifest at doc granularity (q159's stored
    // side) — ~48 bytes/doc, so the NEXT run can extract its changed
    // document work-list (ManifestWriter.deltaAgainstStoredLedger)
    // without re-reading this corpus' bytes. Optional because, unlike
    // the |sources|-row manifest, it is corpus-row-sized.
    if (withLedger)
      ManifestWriter.writeLedger(curated, s"$outDir/ledger")

    // --reconcile: the release-to-release diff — THIS run's shipped
    // corpus vs a previous run's stored ledger, q159's full
    // classification including the `removed` class the streaming
    // monitor cannot see. Fingerprint-sized join; the stored release's
    // bytes are never read.
    reconcileLedger.foreach { stored =>
      ManifestWriter.deltaAgainstStoredLedger(curated, stored)
        .coalesce(1).write.json(s"$outDir/report_reconcile")
    }

    // The audit record ships with the corpus and describes the chain
    // that RAN: q84's per-source funnel, or the extended 6-stage q92;
    // --with-dsir additionally ships the selection stage's per-source
    // decision counts so every shipped stage stays accounted for.
    val report =
      if (withQuality) SparkEntry.queries("q92_extended_funnel")(spark, sfDir)
      else SparkEntry.queries("q84_source_funnel")(spark, sfDir)
    report.coalesce(1).write.json(s"$outDir/report")
    if (withTombstones)
      SparkEntry.queries("q139_deletion_cascade")(spark, sfDir)
        .coalesce(1).write.json(s"$outDir/report_tombstones")
    // Both populations in one report: `n_docs` counts whole-corpus
    // independent decision flags (the same semantics as every other
    // funnel stage), while `n_docs_funnel` restricts to the funnel
    // survivors the semi-join actually gates — so the `selected`
    // rows' n_docs_funnel sum reconciles exactly against the shipped
    // corpus row count.
    dsirScored.foreach { scored =>
      val survivorIds = gated.filter(col("k4"))
        .select(col("doc_id").as("g_id"))
      scored.join(survivorIds, col("doc_id") === col("g_id"), "left")
        .groupBy(col("source"), col("decision"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("g_id")).as("n_docs_funnel"))
        .orderBy(col("source"), col("decision"))
        .coalesce(1).write.json(s"$outDir/report_dsir")
    }

    // --with-audit: the corpus-health release gate. Each panel is the
    // oracled query itself (no re-derivation that could drift) over
    // the INPUT tables — the audit describes the corpus being curated,
    // alongside the funnel report that says what was done about it.
    if (withAudit) AuditPanel.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.json(s"$outDir/audit/$name")
    }

    // --with-buckets: ship the CO-LOCATION layout alongside the plain
    // corpus — curated documents and their embeddings bucketed by id,
    // so every downstream cross-modal id join (q97/q114/q126's shape)
    // reads pre-partitioned data with NO shuffle exchange on either
    // side. BucketingSpec proved the plan property on a fixture; this
    // makes the SHIPPED corpus carry it.
    if (withBuckets)
      shipBucketed(spark, curated, Tables.embeddings(spark, sfDir),
        s"$outDir/corpus_bucketed")
  }

  /** Bucket count of the shipped co-location layout. 16 holds the
    * harness corpora; a 100 TB deployment sizes this to
    * cores-per-exchange-free-join (bucket counts must match across the
    * co-located tables, which is why BOTH ship from one place). */
  val CurateBuckets = 16

  /** Write `curated` documents and the shipped docs' embeddings as
    * id-bucketed, id-sorted parquet under `out`, plus `REGISTER.sql` —
    * the DDL a consumer runs to register both as external bucketed
    * tables (bucket metadata lives in the catalog, not the files; the
    * DDL is what makes the layout survive the ship). Bucketed writes go
    * through `saveAsTable` (Spark's bucket-file naming needs a table),
    * against throwaway catalog entries dropped immediately — external
    * tables, so the files stay. */
  private[graft] def shipBucketed(spark: SparkSession, curated: DataFrame,
      embeddings: DataFrame, out: String): Unit = {
    val vecs = embeddings.join(
      broadcast(curated.select(col("doc_id").as("b_id"))),
      col("vec_id") === col("b_id"), "left_semi")
    def ddlFor(df: DataFrame, table: String, key: String,
        path: String): String = {
      val cols = df.schema.fields
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      s"""CREATE TABLE $table ($cols)
         |USING PARQUET
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $CurateBuckets BUCKETS
         |LOCATION '$path';""".stripMargin
    }
    def ship(df: DataFrame, sub: String, key: String, table: String): String = {
      val path = s"$out/$sub"
      // Collision-free and always a valid identifier: a UUID, not
      // math.abs(path.hashCode) — abs(Int.MinValue) stays negative
      // (a '-' breaks the identifier), and 32-bit collisions across
      // concurrent Curate runs in one session could DROP each other's
      // temp catalog entries mid-ship.
      val tmp = "graft_ship_tmp_" +
        java.util.UUID.randomUUID().toString.replace("-", "_")
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      df.write.bucketBy(CurateBuckets, key).sortBy(key)
        .option("path", path).mode("overwrite").saveAsTable(tmp)
      spark.sql(s"DROP TABLE IF EXISTS $tmp") // external: files stay
      ddlFor(df, table, key, path)
    }
    val ddl =
      ship(curated, "documents", "doc_id", "graft_docs_bucketed") + "\n\n" +
        ship(vecs, "embeddings", "vec_id", "graft_embeddings_bucketed") + "\n"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$out/REGISTER.sql"))
    try os.write(ddl.getBytes("UTF-8")) finally os.close()
  }
}
