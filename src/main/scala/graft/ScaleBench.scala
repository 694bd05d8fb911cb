package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, Features, Similarity}
import graft.tools.ScaleData

/** Scale-evidence harness (round-3 verdict task 4): measures the dedup +
  * vector suites on a deterministically-generated ~10× dataset (~sf1:
  * 50k documents / 20k embeddings vs sf0.1's 5k/2k) and prints
  * per-query base/scaled/ratio JSON; then runs the band-bucket salting
  * wall-clock experiment on a planted viral-duplicate hot bucket
  * (~10⁴ exact copies of one document — the skew mode
  * `DedupSaltingSpec` proves load bounds for, measured here as time).
  *
  * Output: one JSON line per phase on stdout —
  * `{"metric":"scale_ratio",...}` then `{"metric":"salting",...}`.
  * Results land in BENCH_NOTES.md.
  *
  * A third phase (`relational`) covers the q01–q09 relational prefix at
  * the two driver-generated SFs (sf0.01 → sf0.1, 10× TPC-H-ish rows) —
  * round-4 verdict task 8: the prefix previously rode only the driver
  * bench, whose artifact kept truncating, leaving no per-round scale
  * record for those queries.
  *
  * A fourth phase (`tail`) sweeps every remaining query — the
  * relational tail (q10-q19, q47-q53), events (q20-q25, q63-q65, q93),
  * pipeline (q26-q29), and the doc queries outside the generator's
  * reach — at the two driver SFs, closing the round-5 scale-evidence
  * hole (the full surface now has a measured 10× ratio).
  *
  * A fifth phase (`streaming`) closes the round-6 evidence hole: every
  * streaming module was MemoryStream-spec'd at fixture scale but never
  * measured under load. It drives the three gate families a crawl
  * pipeline chains — [[graft.streaming.DedupStreams]] (stateful: the
  * corpus index grows per batch), [[graft.streaming.QualityStreams]]
  * and [[graft.streaming.DsirStreams]] (stateless given their frozen
  * artifacts) — through a file-source stream over the ~sf1 corpus
  * (10× sf0.1 docs) split into `SPARK_GRAFT_STREAM_BATCHES` files,
  * one micro-batch each, reporting per-module rows/s, per-batch
  * latency min/med/max, and (for dedup) the final index state size.
  *
  * A sixth phase (`bpe`) measures [[graft.operators.Bpe]]'s training
  * claim — one corpus scan, then vocabulary-sized rounds — as a table:
  * seed-build time vs per-merge-round time at 1× and 10× docs from the
  * SAME generator (same vocabulary, so corpus size is the only axis).
  *
  * A seventh phase (`media`) times the perceptual near-dup scans
  * ([[graft.pipeline.Media]] pHash / audio fingerprint) over
  * deterministically generated DECODABLE objects (real PNG/JPEG/WAV
  * bytes with ~10% planted perceptual near-dups): the map-only
  * fingerprint stage and the banded 8-byte pair scan are timed
  * separately at 1× and 10× objects — the multimodal twin of the
  * q35/q36 scale table.
  *
  * An eighth phase (`train`) measures
  * [[graft.pipeline.CentroidModel]]'s training claim — one decode scan
  * collapsed map-side to a classes×17-long aggregate — at 1× and 10×
  * labeled images (10 planted luminance bands), asserting perfect
  * training-set accuracy so a training bug reads as accuracy, not time.
  *
  * Env knobs: `SPARK_GRAFT_SCALE_DIR` (default /tmp/graft_scale; data is
  * regenerated only if absent — generation is deterministic),
  * `SPARK_GRAFT_SCALE_DOCS`/`_EMB`/`_HOT` row counts,
  * `SPARK_GRAFT_STREAM_BATCHES` (default 10),
  * `SPARK_GRAFT_BPE_MERGES` (default 24),
  * `SPARK_GRAFT_SCALE_MEDIA` (default 2000 objects per modality),
  * `SPARK_GRAFT_SERVE_REQS` (default 12 single-request serve calls),
  * `SPARK_GRAFT_SCALE_PHASE` = suite | skew | relational | tail |
  * streaming | bpe | media | train | serve | both (all).
  *
  * A ninth phase (`serve`) measures the retrieval SERVING path
  * ([[graft.Serve]]) end-to-end at ~sf1: batch standing-panel latency
  * per retriever cold/warm (with and without `--diversify` MMR), and
  * single-request p50/p95 through the full CLI path — the wall-clock
  * figure an ANN deployment watches next to the recall audits.
  */
object ScaleBench {

  /** Dedup + vector suite: every query that reads only documents /
    * embeddings (the tables the generator produces). */
  private val Names = Seq(
    "q33_fingerprint", "q34_content_dedup", "q35_minhash_lsh", "q36_simhash",
    "q37_shingle_jaccard", "q38_cosine_topk", "q39_lsh_ann",
    "q40_embedding_neardup", "q41_label_centroids", "q44_ivf_ann",
    "q45_exact_dedup", "q54_edit_verify", "q56_dedup_clusters",
    "q57_tfidf_terms", "q58_scalar_quant", "q59_banded_edit",
    "q60_dedup_decisions", "q66_ann_retrieval", "q69_incremental_dedup",
    "q70_dedup_report", "q71_embedding_profile", "q72_bloom_incremental",
    "q73_decontamination", "q74_term_redaction", "q75_source_mixing",
    "q76_context_packing", "q77_semantic_dedup", "q78_curation_funnel",
    "q79_kmeans_step", "q80_repetition", "q81_boilerplate",
    "q82_source_overlap", "q83_split_assign", "q84_source_funnel",
    "q85_span_dedup", "q86_bm25", "q87_lm_quality", "q88_containment",
    "q89_quality_gate", "q90_sketch_quantiles", "q91_pmi_collocations",
    "q92_extended_funnel", "q94_temperature_mixing", "q95_source_quality",
    "q96_sketch_fidelity", "q97_integrity", "q98_simhash_fidelity",
    "q99_heavy_hitters", "q100_embedding_drift", "q101_source_kl",
    "q102_packing_audit", "q103_epoch_allocator", "q104_chunking",
    "q105_semantic_decontam", "q106_cluster_prune", "q107_dsir_weights",
    "q108_method_agreement", "q109_surprisal_mixing",
    "q110_dup_histogram", "q111_epoch_shuffle", "q112_quality_agreement",
    "q113_ann_recall", "q114_crossmodal_dedup", "q115_gopher_rules",
    "q116_split_leakage", "q117_source_psi", "q118_span_decontamination",
    "q119_contamination_triage", "q120_dedup_savings",
    "q121_chunk_dedup_rate", "q122_source_novelty",
    "q123_soft_dedup_weights", "q124_hard_negatives", "q125_zipf_audit",
    "q126_label_psi", "q127_eval_roster", "q128_source_entropy",
    "q129_banding_recall", "q130_ivf_cell_profile", "q131_vocab_coverage",
    "q132_span_severity", "q133_split_repair", "q135_pq_codes",
    "q136_pq_adc_recall", "q137_ivfpq_adc", "q138_repetition_exposure",
    "q139_deletion_cascade", "q140_canonical_handoff", "q141_bigram_lm",
    "q142_banding_sweep", "q143_weighted_sample", "q144_rrf_fusion",
    "q146_dup_degree", "q151_corpus_manifest", "q153_manifest_diff",
    "q154_ks_drift", "q157_datasheet", "q158_pq_budget_sweep",
    "q159_snapshot_delta", "q160_cluster_purity", "q161_norm_lift",
    "q162_decontam_sweep", "q163_coverage_curve", "q164_token_gini",
    "q165_rebuild_plan", "q166_nprobe_sweep", "q167_gate_calibration",
    "q168_retrieval_eval", "q169_centroid_recovery", "q170_margin_audit",
    "q171_margin_calibration", "q172_relabel_roster",
    "q173_source_recovery", "q174_drift_panel", "q175_label_noise",
    "q176_emd_drift", "q177_good_turing", "q178_noise_roster",
    "q179_burstiness", "q180_crawl_runs", "q181_noise_by_source",
    "q182_confidence_drift", "q183_trust_panel", "q186_source_kappa",
    "q187_risk_coverage", "q188_label_lift", "q189_cluster_density",
    "q190_simpson", "q193_hubness", "q196_twonn_id",
    "q197_cond_entropy", "q198_rank_corr", "q204_mutual_knn",
    "q209_head_scorecard", "q213_centroid_separation",
    "q214_cluster_health", "q215_vocab_growth",
    "q218_dup_quality_phi", "q219_secret_scan", "q220_dup_trend",
    "q222_norm_margin_corr", "q224_format_profile", "q225_cluster_span",
    "q226_quant_impact", "q227_quality_trend", "q228_dup_distance",
    "q237_prefix_families", "q238_embedding_quality",
    "q240_knn_homophily", "q247_perm_sweep")

  /** The relational prefix: TPC-H-shaped queries over the driver
    * testdata's lineitem/orders/customer tables at two SFs. */
  private val RelationalNames = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_shipping_priority",
    "q04_priority_exists", "q05_local_supplier", "q06_forecast_revenue",
    "q07_window_topk", "q08_running_total", "q09_segment_stats",
    "q134_topk_agg", "q230_trailing_revenue", "q231_fk_orphans",
    "q232_returned_revenue", "q233_waiting_suppliers", "q234_idle_rich",
    "q239_price_qty_corr", "q241_order_aging", "q242_share_drift",
    "q244_supplier_gini", "q245_repeat_interval", "q246_reorder_rate")

  /** Everything else (round-5 verdict task 5: the full 98-query surface
    * needs scale evidence, not just the doc/embedding + q01-q09 subset):
    * the relational tail, the events suite, the pipeline queries, and
    * the doc queries that also read driver-only tables. Swept at the two
    * driver SFs (sf0.01 → sf0.1 = 10× rows) like the relational phase —
    * the generator only produces documents/embeddings, so driver tables
    * ARE the scale axis for these. */
  private val TailNames = Seq(
    "q10_no_bigorder_anti", "q11_rollup_flags", "q12_priority_case",
    "q13_order_count_dist", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_qty_rev", "q18_large_orders",
    "q19_band_join", "q20_hourly_events", "q21_user_pivot",
    "q22_event_gaps", "q23_first_event", "q24_json_buckets",
    "q25_sessionize", "q26_manifest_sanitize", "q27_classify_stub",
    "q28_kv_sorted", "q29_class_analytics", "q30_token_stats",
    "q31_quality", "q32_lang_guess", "q42_binary_meta",
    "q43_media_profile", "q46_bpe_tokens", "q47_set_ops",
    "q48_date_math", "q49_salted_agg", "q50_vocab", "q51_vocab_approx",
    "q52_asof_join", "q53_range_join", "q55_det_sample",
    "q61_length_quantiles", "q62_profile", "q63_funnel_daily",
    "q64_retention", "q65_rate_anomaly", "q67_normalize",
    "q68_content_scan", "q93_trending", "q145_scd2_intervals",
    "q147_state_attribution", "q148_scd2_incremental",
    "q149_event_pairs", "q150_rfm_segments", "q152_mad_outliers",
    "q155_event_debounce", "q156_touch_attribution", "q184_cusum_shift",
    "q191_event_transitions", "q192_entry_sessions", "q194_survival",
    "q195_stationary", "q199_seasonality", "q200_period_scan",
    "q201_cadence_cv", "q202_growth_accounting", "q203_session_funnel",
    "q205_seq_support", "q206_conversion_latency", "q207_dwell_share",
    "q208_entry_exit", "q210_session_paths", "q211_return_latency",
    "q212_depth_by_entry", "q216_weekly_cohorts", "q217_ltv_deciles",
    "q221_error_streaks", "q223_gap_tail_quantiles",
    "q229_entry_value", "q235_peak_concurrency", "q236_user_gini",
    "q243_weekday_profile")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "50000").toLong
    val nEmb = sys.env.getOrElse("SPARK_GRAFT_SCALE_EMB", "20000").toLong
    val hotCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_HOT", "10000").toLong
    val phase = sys.env.getOrElse("SPARK_GRAFT_SCALE_PHASE", "both")
    val spark = GraftSession.builder(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v,k=v" — session-conf knobs for targeted
    // experiments (e.g. the q40 banding demo: lshBits=32,lshBands=2).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").map(_.trim)
      .filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
        System.err.println(s"[ScaleBench] conf $k=$v")
      })

    // Locale-proof fixed-point formatting: these lines are machine-parsed
    // JSON, and the f-interpolator would emit decimal commas under e.g.
    // de_DE.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def noopWrite(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    if (phase == "suite" || phase == "both") {
      val sf1 = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$sf1/documents.parquet")))
        ScaleData.generate(spark, sf1, nDocs, nEmb)

      // SPARK_GRAFT_SCALE_NAMES=q168_retrieval_eval,q40_embedding_neardup
      // restricts the sweep — the targeted-sample knob for a query that
      // landed after a full run (full sweeps leave it unset).
      val names = sys.env.get("SPARK_GRAFT_SCALE_NAMES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Names)
      def sweep(dir: String): (Double, Map[String, Double]) = {
        val fb = time {
          noopWrite(Features.shingleSets(spark, dir))
          noopWrite(Features.hashedShingles(spark, dir))
          noopWrite(Features.scaledEmb(spark, dir))
        }
        // two interleaved passes, min per query (Bench's timing model)
        val passes = (1 to 2).map(_ =>
          names.map(n => time(noopWrite(SparkEntry.queries(n)(spark, dir)))))
        (fb, names.zipWithIndex
          .map { case (n, i) => n -> passes.map(_(i)).min }.toMap)
      }
      val (fbBase, tBase) = sweep(base)
      val (fbSf1, tSf1) = sweep(sf1)
      val qs = names.map { n =>
        val (a, b) = (tBase(n), tSf1(n))
        s""""$n":[${f3(a)},${f3(b)},${f2(b / a)}]"""
      }.mkString("{", ",", "}")
      val (sumA, sumB) = (tBase.values.sum, tSf1.values.sum)
      println(
        s"""{"metric":"scale_ratio","base":"$base","scaled":"$sf1",""" +
          s""""rows":{"documents":[5000,$nDocs],"embeddings":[2000,$nEmb]},""" +
          s""""feature_build":[${f3(fbBase)},${f3(fbSf1)}],""" +
          s""""total":[${f3(sumA)},${f3(sumB)},${f2(sumB / sumA)}],"queries":$qs}""")
    }

    if (phase == "relational" || phase == "both") {
      val small = sys.env.getOrElse("SPARK_GRAFT_SMALL_SF_DIR",
        "/root/testdata/sf0.01")
      // Same timing model as the suite phase: two interleaved passes,
      // min per query, at each SF.
      def sweepRel(dir: String): Map[String, Double] = {
        val passes = (1 to 2).map(_ =>
          RelationalNames.map(n =>
            time(noopWrite(SparkEntry.queries(n)(spark, dir)))))
        RelationalNames.zipWithIndex
          .map { case (n, i) => n -> passes.map(_(i)).min }.toMap
      }
      val tSmall = sweepRel(small)
      val tBase = sweepRel(base)
      val qs = RelationalNames.map { n =>
        val (a, b) = (tSmall(n), tBase(n))
        s""""$n":[${f3(a)},${f3(b)},${f2(b / a)}]"""
      }.mkString("{", ",", "}")
      val (sumA, sumB) = (tSmall.values.sum, tBase.values.sum)
      println(
        s"""{"metric":"relational_prefix","base":"$small","scaled":"$base",""" +
          s""""total":[${f3(sumA)},${f3(sumB)},${f2(sumB / sumA)}],"queries":$qs}""")
    }

    if (phase == "tail" || phase == "both") {
      val small = sys.env.getOrElse("SPARK_GRAFT_SMALL_SF_DIR",
        "/root/testdata/sf0.01")
      def sweepTail(dir: String): Map[String, Double] = {
        val passes = (1 to 2).map(_ =>
          TailNames.map(n =>
            time(noopWrite(SparkEntry.queries(n)(spark, dir)))))
        TailNames.zipWithIndex
          .map { case (n, i) => n -> passes.map(_(i)).min }.toMap
      }
      val tSmall = sweepTail(small)
      val tBase = sweepTail(base)
      val qs = TailNames.map { n =>
        val (a, b) = (tSmall(n), tBase(n))
        s""""$n":[${f3(a)},${f3(b)},${f2(b / a)}]"""
      }.mkString("{", ",", "}")
      val (sumA, sumB) = (tSmall.values.sum, tBase.values.sum)
      println(
        s"""{"metric":"tail_suite","base":"$small","scaled":"$base",""" +
          s""""total":[${f3(sumA)},${f3(sumB)},${f2(sumB / sumA)}],"queries":$qs}""")
    }

    if (phase == "streaming" || phase == "both") {
      val sf1 = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$sf1/documents.parquet")))
        ScaleData.generate(spark, sf1, nDocs, nEmb)
      val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
      // Stage the ~sf1 corpus as one file per intended micro-batch: the
      // file source with maxFilesPerTrigger=1 then delivers it as
      // `batches` micro-batches — the production arrival shape (a crawl
      // drop every trigger), not one giant replay.
      val stage = s"$out/stream_docs_$batches"
      if (!Files.exists(Paths.get(stage)))
        spark.read.parquet(s"$sf1/documents.parquet")
          .repartition(batches)
          .write.parquet(stage)
      val inRows = spark.read.parquet(stage).count()

      /** Drive one gate to exhaustion; report per-batch completion
        * latencies (diffs of completion stamps, stream start as the
        * zeroth mark — so each batch's figure includes ALL its work,
        * wherever the module does it) and end-to-end rows/s. */
      def drive(start: ((DataFrame, Long) => Unit) =>
          org.apache.spark.sql.streaming.StreamingQuery): (Double, Long, Seq[Double]) = {
        val marks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        val t0 = System.nanoTime()
        val q = start { (scored, bid) =>
          val n = scored.count() // force the batch's full plan
          marks.synchronized { marks += ((System.nanoTime(), n)) }
        }
        try { q.processAllAvailable() } finally q.stop()
        val done = marks.sortBy(_._1)
        val outRows = done.map(_._2).sum
        val stamps: Seq[Long] = t0 +: done.map(_._1).toSeq
        val lats = stamps.sliding(2).map(w => (w(1) - w(0)) / 1e9).toSeq
        ((done.last._1 - t0) / 1e9, outRows, lats)
      }
      def latStats(l: Seq[Double]): String = {
        val s = l.sorted
        s"""[${f2(s.head)},${f2(s(s.size / 2))},${f2(s.last)}]"""
      }

      // Stateless gates: frozen artifacts trained on the base corpus.
      val lm = graft.operators.TextAnalysis.lmTable(spark, base)
      val lr = graft.operators.TextAnalysis.dsirLrTable(spark, base)
      import graft.streaming.{DedupStreams, DsirStreams, QualityStreams}
      def src() = DedupStreams.documentSource(spark, stage, maxFilesPerTrigger = 1)

      val (qSec, qRows, qLats) = drive(cb =>
        QualityStreams.qualityGate(src(), lm, cb))
      val (dSec, dRows, dLats) = drive(cb =>
        DsirStreams.selectionGate(src(), lr, cb))

      // Stateful gate: judge the stream against the base corpus' index,
      // admitted docs folded back in per batch (the ingest loop).
      val baseDocs = Tables.documents(spark, base)
        .select("doc_id", "text")
      val index = DedupStreams.corpusIndex(baseDocs)
      val baseFp = index.fp.count()
      val refresher = new DedupStreams.RefreshingIndex(index)
      val (iSec, iRows, iLats) = drive(cb =>
        DedupStreams.incrementalDedup(src(), index,
          refresher = Some(refresher))(cb).start())
      val finalFp = refresher.current.fp.count()

      def mod(n: String, sec: Double, rows: Long, lats: Seq[Double],
          extra: String = ""): String =
        s""""$n":{"sec":${f2(sec)},"out_rows":$rows,""" +
          s""""rows_per_sec":${f2(inRows / sec)},""" +
          s""""batch_latency_mmm":${latStats(lats)}$extra}"""
      println(
        s"""{"metric":"streaming","in_rows":$inRows,"batches":$batches,""" +
          mod("quality_gate", qSec, qRows, qLats) + "," +
          mod("dsir_gate", dSec, dRows, dLats) + "," +
          mod("incremental_dedup", iSec, iRows, iLats,
            s""","index_rows":[$baseFp,$finalFp]""") + "}")

      // Stateful EVENT monitors (frontier state per user) over the
      // driver events table, staged time-range-partitioned so
      // micro-batches approximate arrival order; boundary disorder is
      // MEASURED, not hidden — the late-marker counts ship in the line.
      import graft.streaming.{EventStreams, GrowthStreams, SessionStreams, TransitionStreams}
      import spark.implicits._
      val evStage = s"$out/stream_events_$batches"
      if (!Files.exists(Paths.get(evStage)))
        spark.read.parquet(s"$base/events.parquet")
          .repartitionByRange(batches,
            org.apache.spark.sql.functions.col("ts"))
          .write.parquet(evStage)
      val evRows = spark.read.parquet(evStage).count()
      def evSrc() = spark.readStream
        .schema(spark.read.parquet(evStage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(evStage)
        .as[EventStreams.EventRow]

      val (tSec, tRows, tLats) = drive(cb =>
        TransitionStreams.transitions(evSrc()).toDF().writeStream
          .outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) => cb(b, id)).start())
      val (gSec, gRows, gLats) = drive(cb =>
        GrowthStreams.dayClasses(evSrc()).toDF().writeStream
          .outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) => cb(b, id)).start())
      def evMod(n: String, sec: Double, rows: Long, lats: Seq[Double]): String =
        s""""$n":{"sec":${f2(sec)},"out_rows":$rows,""" +
          s""""rows_per_sec":${f2(evRows / sec)},""" +
          s""""batch_latency_mmm":${latStats(lats)}}"""
      println(
        s"""{"metric":"streaming_events","in_rows":$evRows,""" +
          s""""batches":$batches,""" +
          evMod("transition_monitor", tSec, tRows, tLats) + "," +
          evMod("growth_monitor", gSec, gRows, gLats) + "}")
    }

    if (phase == "bpe" || phase == "both") {
      // BPE training's scale claim, measured: the corpus is scanned
      // ONCE (the seed word-frequency build), and every merge round
      // then runs over the vocabulary-sized frame — so at 10× the
      // corpus the seed cost may grow ~10× while per-round cost stays
      // ~flat (both corpora come from the same generator, so the
      // vocabulary itself is the same). nMerges=0 isolates the seed.
      import graft.operators.Bpe
      import org.apache.spark.sql.functions.{col, explode}
      import graft.functions.TextFns.tokens
      val smallDir = s"$out/gen_small"
      val sf1 = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$smallDir/documents.parquet")))
        ScaleData.generate(spark, smallDir, nDocs / 10, nEmb / 10)
      if (!Files.exists(Paths.get(s"$sf1/documents.parquet")))
        ScaleData.generate(spark, sf1, nDocs, nEmb)
      val rounds = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "24").toInt
      def sweepBpe(dir: String): (Long, Long, Double, Double) = {
        val docs = Tables.documents(spark, dir)
        val nWords = docs.select(explode(tokens(col("text"))).as("w"))
          .distinct().count()
        // two passes each, min — Bench's timing model
        val tSeed = (1 to 2).map(_ => time(Bpe.train(docs, 0))).min
        val tFull = (1 to 2).map(_ => time {
          val m = Bpe.train(docs, rounds)
          require(m.rounds == rounds, s"expected $rounds merges, got ${m.rounds}")
        }).min
        (docs.count(), nWords, tSeed, (tFull - tSeed) / rounds)
      }
      val (dA, vA, sA, rA) = sweepBpe(smallDir)
      val (dB, vB, sB, rB) = sweepBpe(sf1)
      println(
        s"""{"metric":"bpe_train","docs":[$dA,$dB],"vocab_words":[$vA,$vB],""" +
          s""""rounds":$rounds,"seed_sec":[${f3(sA)},${f3(sB)},${f2(sB / sA)}],""" +
          s""""round_sec":[${f3(rA)},${f3(rB)},${f2(rB / rA)}]}""")
    }

    if (phase == "train" || phase == "both") {
      // Centroid training's scale claim, measured: training is ONE
      // corpus scan (decode + featurize, embarrassingly parallel)
      // collapsed map-side into a classes×17-long aggregate, so at 10×
      // the images wall-clock grows ≤~10× (scan-bound, no shuffle
      // growth) and the artifact stays constant-size. Accuracy on the
      // training corpus itself must be perfect — the 10 planted
      // luminance bands are separable by construction, so a training
      // bug (wrong quantization, class mixup) reads as accuracy, not
      // just time.
      import graft.pipeline.{CentroidModel, Media}
      import org.apache.spark.sql.functions.col
      val nTrain = sys.env.getOrElse("SPARK_GRAFT_SCALE_TRAIN", "2000").toLong
      def sweepTrain(n: Long, tag: String): (Double, CentroidModel, Double) = {
        val dir = s"$out/train_$tag"
        if (!Files.exists(Paths.get(s"$dir/labeled.parquet")))
          ScaleData.generateLabeledImages(spark, dir, n)
        val df = spark.read.parquet(s"$dir/labeled.parquet")
        var model: CentroidModel = null
        val t = (1 to 2)
          .map(_ => time { model = CentroidModel.trainOnImages(df) }).min
        val m = model
        import spark.implicits._
        val correct = df.select(col("label_idx").cast("int"), col("content"))
          .as[(Int, Array[Byte])]
          .map { case (idx, bytes) =>
            if (m.scoreFeatures(Media.imageFeatures(bytes))._1 == idx) 1L
            else 0L
          }.reduce(_ + _)
        (t, m, correct.toDouble / n)
      }
      val (tA, mA, accA) = sweepTrain(nTrain, s"base_$nTrain")
      val (tB, mB, accB) = sweepTrain(nTrain * 10, s"x10_${nTrain * 10}")
      require(mA.numClasses == 10 && mB.numClasses == 10,
        "labeled generator must produce all 10 classes")
      println(
        s"""{"metric":"centroid_train","images":[$nTrain,${nTrain * 10}],""" +
          s""""classes":10,"train_sec":[${f3(tA)},${f3(tB)},${f2(tB / tA)}],""" +
          s""""train_acc":[${f3(accA)},${f3(accB)}]}""")

      // The logistic head's claim: per epoch one corpus pass collapsing
      // to k·(dim+1)+1 longs — so wall-clock ~ epochs × scan, and the
      // same 10 planted bands must train to perfect accuracy (a
      // training bug reads as accuracy, not time).
      def sweepLogit(n: Long, tag: String): (Double, Double) = {
        val dir = s"$out/train_$tag"
        val df = spark.read.parquet(s"$dir/labeled.parquet")
        var model: graft.pipeline.LogitModel = null
        val t = (1 to 2).map(_ => time {
          model = graft.pipeline.LogitModel.trainOnImages(df)
        }).min
        val m = model
        import spark.implicits._
        import graft.pipeline.Media
        val correct = df.select(col("label_idx").cast("int"), col("content"))
          .as[(Int, Array[Byte])]
          .map { case (idx, bytes) =>
            if (m.scoreFeatures(Media.imageFeatures(bytes))._1 == idx) 1L
            else 0L
          }.reduce(_ + _)
        (t, correct.toDouble / n)
      }
      val (lA, laccA) = sweepLogit(nTrain, s"base_$nTrain")
      val (lB, laccB) = sweepLogit(nTrain * 10, s"x10_${nTrain * 10}")
      println(
        s"""{"metric":"logit_train","images":[$nTrain,${nTrain * 10}],""" +
          s""""classes":10,"epochs":40,""" +
          s""""train_sec":[${f3(lA)},${f3(lB)},${f2(lB / lA)}],""" +
          s""""train_acc":[${f3(laccA)},${f3(laccB)}]}""")
    }

    if (phase == "media" || phase == "both") {
      // Perceptual near-dup at scale: decode/fingerprint is the
      // map-only corpus-sized stage (blobs never shuffle), and the
      // banded pair scan touches ONLY the 8-byte hashes — so at 10×
      // the objects, fingerprinting may scale ~linearly (perfectly
      // parallel) while the pair scan stays hash-table-sized.
      import graft.pipeline.Media
      import org.apache.spark.sql.functions.col
      val nMedia = sys.env.getOrElse("SPARK_GRAFT_SCALE_MEDIA", "2000").toLong
      def sweepMedia(n: Long, tag: String): Map[String, (Double, Double, Long)] = {
        val dir = s"$out/media_$tag"
        if (!Files.exists(Paths.get(s"$dir/images.parquet")) ||
            !Files.exists(Paths.get(s"$dir/audio.parquet")))
          ScaleData.generateMedia(spark, dir, n, n)
        import spark.implicits._
        Seq("image" -> s"$dir/images.parquet",
          "audio" -> s"$dir/audio.parquet").map { case (kind, p) =>
          val objs = spark.read.parquet(p)
            .select(col("path"), col("kind"), col("content"))
            .as[Media.MediaObject]
          val hashes =
            (if (kind == "image") Media.imageHashes(objs)
             else Media.audioHashes(objs)).persist()
          // fingerprint stage: decode every blob once (cache it so the
          // pair-scan timing cannot re-pay the decode)
          val tFp = time(hashes.count())
          val tScan = (1 to 2)
            .map(_ => time(noopWrite(Media.bandedHashPairs(hashes)))).min
          val pairs = Media.bandedHashPairs(hashes).count()
          hashes.unpersist(blocking = false)
          kind -> ((tFp, tScan, pairs))
        }.toMap
      }
      val base = sweepMedia(nMedia, s"base_$nMedia")
      val scaled = sweepMedia(nMedia * 10, s"x10_${nMedia * 10}")
      def leg(kind: String): String = {
        val (fa, sa, pa) = base(kind)
        val (fb, sb, pb) = scaled(kind)
        s""""$kind":{"fp_sec":[${f3(fa)},${f3(fb)},${f2(fb / fa)}],""" +
          s""""scan_sec":[${f3(sa)},${f3(sb)},${f2(sb / sa)}],""" +
          s""""pairs":[$pa,$pb]}"""
      }
      println(
        s"""{"metric":"media_neardup","objects":[$nMedia,${nMedia * 10}],""" +
          leg("image") + "," + leg("audio") + "}")
    }

    if (phase == "serve" || phase == "both") {
      // Serve-path latency (round-11 verdict task 5): recall is audited
      // (q113/q166/q168) — this measures the number an ANN deployment
      // watches NEXT TO recall: end-to-end serving wall-clock. Two
      // regimes at ~sf1: (a) the standing-panel batch serve per
      // retriever (index build amortized by the session cache — cold
      // first call, then warm), with and without the MMR diversify
      // pass; (b) single-request latency — Serve with a one-id query
      // file, N repeated calls, p50/p95 — the per-request figure, full
      // CLI path included (parse, plan, probe, artifact write).
      val sf1 = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$sf1/documents.parquet")))
        ScaleData.generate(spark, sf1, nDocs, nEmb)
      val serveOut = Files.createTempDirectory("graft_serve_").toString
      var n = 0
      def runServe(extra: String*): Double = {
        n += 1
        val t = time {
          require(Serve.run(
            Array(sf1, s"$serveOut/run$n") ++ extra, Some(spark)) == 0,
            s"Serve failed: ${extra.mkString(" ")}")
        }
        t
      }
      def servedRows(dirN: Int): Long =
        spark.read.json(s"$serveOut/run$dirN/results").count()

      // (a) batch panel: cold (builds the session index frames), then
      // two warm passes (min — Bench's model), per retriever.
      def batchLeg(retriever: String, extra: String*): (Double, Double, Long) = {
        val cold = runServe(Seq("--retriever", retriever) ++ extra: _*)
        val rowsAt = n
        val warm = (1 to 2).map(_ =>
          runServe(Seq("--retriever", retriever) ++ extra: _*)).min
        (cold, warm, servedRows(rowsAt))
      }
      val (dCold, dWarm, dRows) = batchLeg("dense")
      val (iCold, iWarm, iRows) = batchLeg("ivf")
      val (fCold, fWarm, fRows) = batchLeg("fused")
      val (mCold, mWarm, mRows) = batchLeg("fused", "--diversify", "70")

      // (b) single-request latency: one-id query file, N calls.
      val oneId = Tables.embeddings(spark, sf1)
        .agg(org.apache.spark.sql.functions.min("vec_id"))
        .collect().head.getLong(0) // min id is inside the served query panel
      val idFile = Paths.get(serveOut, "one_query.txt")
      Files.write(idFile, s"$oneId\n".getBytes("UTF-8"))
      val reqN = sys.env.getOrElse("SPARK_GRAFT_SERVE_REQS", "12").toInt
      def requestLats(retriever: String, extra: String*): (Double, Double) = {
        val lats = (1 to reqN).map(_ =>
          runServe(Seq("--retriever", retriever,
            "--queries", idFile.toString) ++ extra: _*)).sorted
        (lats(lats.size / 2), lats((lats.size * 95) / 100 min (lats.size - 1)))
      }
      val (ivP50, ivP95) = requestLats("ivf")
      val (fuP50, fuP95) = requestLats("fused")
      val (dvP50, dvP95) = requestLats("fused", "--diversify", "70")
      val (faP50, faP95) = requestLats("fused-ann")

      // fused-ann recall AUDIT (round-16 verdict task 3): panel-wide,
      // the ANN variant's top-k doc sets vs the exact fused reference —
      // the same discipline every index swap in the engine carries.
      val allIds = Similarity.servableQueryIds(spark, sf1)
      def topDocs(df: DataFrame): Map[Long, Set[Long]] =
        df.select("q_id", "doc_id").collect()
          .groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val exactTop = topDocs(Similarity.serveFusedRequest(spark, sf1, allIds))
      val annTop = topDocs(Similarity.serveFusedAnnRequest(spark, sf1, allIds))
      val faRecall = {
        val per = exactTop.toSeq.map { case (q, ds) =>
          annTop.getOrElse(q, Set.empty[Long]).intersect(ds).size.toDouble /
            math.max(1, ds.size)
        }
        if (per.isEmpty) 0.0 else per.sum / per.size
      }

      def leg(nm: String, cold: Double, warm: Double, rows: Long): String =
        s""""$nm":{"cold_sec":${f2(cold)},"warm_sec":${f2(warm)},""" +
          s""""rows":$rows,"rows_per_sec":${f2(rows / warm)}}"""
      println(
        s"""{"metric":"serve_latency","docs":$nDocs,"embeddings":$nEmb,""" +
          leg("dense", dCold, dWarm, dRows) + "," +
          leg("ivf", iCold, iWarm, iRows) + "," +
          leg("fused", fCold, fWarm, fRows) + "," +
          leg("fused_mmr70", mCold, mWarm, mRows) + "," +
          s""""request_p50_p95_sec":{"ivf":[${f2(ivP50)},${f2(ivP95)}],""" +
          s""""fused":[${f2(fuP50)},${f2(fuP95)}],""" +
          s""""fused_mmr70":[${f2(dvP50)},${f2(dvP95)}],""" +
          s""""fused_ann":[${f2(faP50)},${f2(faP95)}]},""" +
          s""""fused_ann_recall":${f3(faRecall)},"requests":$reqN}""")
    }

    // Serve-path CONCURRENCY (round-13 verdict task 7): the serving
    // posture had latency (phase `serve`) but no figure for PARALLEL
    // retrievals through one shared session — the shape a serving
    // deployment actually runs (Spark schedules concurrent actions
    // from multiple driver threads; the session index frames are the
    // shared cache). 8/16/32 request drivers each run the full Serve
    // CLI path (parse, plan, probe, artifact write) against the ~sf1
    // corpus; reported per tier: p50/p99 request latency and
    // requests/s + served rows/s throughput.
    if (phase == "serveconc" || phase == "both") {
      val sf1 = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$sf1/documents.parquet")))
        ScaleData.generate(spark, sf1, nDocs, nEmb)
      val servOut = Files.createTempDirectory("graft_serveconc_").toString
      val oneId = Tables.embeddings(spark, sf1)
        .agg(org.apache.spark.sql.functions.min("vec_id"))
        .collect().head.getLong(0) // min id is inside the served query panel
      val idFile = Paths.get(servOut, "one_query.txt")
      Files.write(idFile, s"$oneId\n".getBytes("UTF-8"))
      // Both REQUEST paths (round-16: fused is the CLI default and now
      // has one — the round-15 `weak` grade). Warm each retriever's
      // index frames once so every tier measures the steady serving
      // state, not the first build.
      for (retriever <- Seq("ivf", "fused", "fused-ann")) {
        require(Serve.run(Array(sf1, s"$servOut/warm-$retriever",
          "--retriever", retriever, "--queries", idFile.toString),
          Some(spark)) == 0, s"warm $retriever failed")
        val reqRows =
          spark.read.json(s"$servOut/warm-$retriever/results").count()
        val tiers = Seq(8, 16, 32).map { par =>
          val reqTotal = par * 4
          val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          val t0 = System.nanoTime()
          val futs = (1 to reqTotal).map { i =>
            scala.concurrent.Future {
              // One FAIR pool per driver thread (GraftSession runs the
              // scheduler in FAIR mode): concurrent probes interleave
              // stage-by-stage instead of queueing FIFO behind the first
              // submitter — the round-14 saturation mechanism.
              spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", s"serve-${i % par}")
              val s0 = System.nanoTime()
              require(Serve.run(Array(sf1, s"$servOut/$retriever-c$par-$i",
                "--retriever", retriever, "--queries", idFile.toString),
                Some(spark)) == 0, s"request $i failed")
              (System.nanoTime() - s0) / 1e9
            }
          }
          val lats = futs.map(f => scala.concurrent.Await.result(f,
            scala.concurrent.duration.Duration.Inf)).sorted
          val wall = (System.nanoTime() - t0) / 1e9
          pool.shutdown()
          val p50 = lats(lats.size / 2)
          val p99 = lats(((lats.size * 99) / 100) min (lats.size - 1))
          s""""par$par":{"requests":$reqTotal,"wall_sec":${f2(wall)},""" +
            s""""p50_sec":${f2(p50)},"p99_sec":${f2(p99)},""" +
            s""""req_per_sec":${f2(reqTotal / wall)},""" +
            s""""rows_per_sec":${f2(reqRows * reqTotal / wall)}}"""
        }
        println(s"""{"metric":"serve_concurrency","retriever":"$retriever",""" +
          s""""docs":$nDocs,"embeddings":$nEmb,"rows_per_request":$reqRows,""" +
          tiers.mkString(",") + "}")
      }
    }

    if (phase == "skew" || phase == "both") {
      val hotDir = s"$out/hot"
      if (!Files.exists(Paths.get(s"$hotDir/documents.parquet")))
        ScaleData.generateHot(spark, hotDir, nBase = 10000, hotCopies = hotCopies)
      val sig = Dedup.minhashSigOf(Tables.documents(spark, hotDir)).persist()
      sig.count() // warm: signature build is shared by all variants
      val SkewJoinConf = "spark.sql.adaptive.skewJoin.enabled"
      val BcastConf = "spark.sql.autoBroadcastJoinThreshold"
      def timed(salt: Int, aqeSkew: Boolean, broadcast: Boolean): Double = {
        if (salt > 1) spark.conf.set(Dedup.SaltBucketsConf, salt.toString)
        else spark.conf.unset(Dedup.SaltBucketsConf)
        spark.conf.set(SkewJoinConf, aqeSkew.toString)
        // broadcast=false forces the shuffle-join regime — at corpus
        // scale the banded table cannot broadcast (it's the corpus ×
        // LshBands), which is exactly when a hot bucket concentrates on
        // one shuffle key. At this experiment's size the table is ~5 MB,
        // under the default threshold, so without forcing it Spark
        // broadcast-joins and the hazard never materializes.
        if (!broadcast) spark.conf.set(BcastConf, "-1")
        try time(noopWrite(Dedup.minhashVerifiedPairs(sig)))
        finally {
          spark.conf.unset(Dedup.SaltBucketsConf)
          spark.conf.set(SkewJoinConf, "true")
          spark.conf.unset(BcastConf)
        }
      }
      // Five variants, three regimes: (1) broadcast join — small-scale
      // local answer, no key concentration possible; (2) shuffle join
      // with AQE skew split — the engine's own runtime defense; (3)
      // shuffle join without AQE skew split — where manual salting is
      // the only defense. Two alternating passes each, min, so
      // codegen/JIT warm-up and contention windows can't bias a variant.
      val variants = Seq(
        ("broadcast", 1, true, true),
        ("shuffle_unsalted_aqe", 1, true, false),
        ("shuffle_salted_aqe", 8, true, false),
        ("shuffle_unsalted_noaqe", 1, false, false),
        ("shuffle_salted_noaqe", 8, false, false))
      val times = (1 to 2).map(_ =>
        variants.map { case (_, s, a, b) => timed(s, a, b) })
      val mins = variants.zipWithIndex.map { case ((v, i)) =>
        v._1 -> times.map(_(i)).min
      }
      val pairs = Dedup.minhashVerifiedPairs(sig).count()
      sig.unpersist(blocking = false)
      val fields = mins.map { case (n, t) => s""""${n}_sec":${f2(t)}""" }.mkString(",")
      val m = mins.toMap
      println(
        s"""{"metric":"salting","hot_copies":$hotCopies,"base_docs":10000,""" +
          s""""accepted_pairs":$pairs,$fields,""" +
          s""""noaqe_speedup":${f2(m("shuffle_unsalted_noaqe") / m("shuffle_salted_noaqe"))},""" +
          s""""aqe_speedup":${f2(m("shuffle_unsalted_aqe") / m("shuffle_salted_aqe"))},"salt":8}""")

      // q108's content-equality leg on the same viral corpus (round-12
      // verdict task 3's wall-clock line): at the default cap the
      // 10⁴-copy fingerprint group emits NOTHING — the leg costs one
      // pass over the base corpus — while lifting the cap above the
      // group re-admits its m·(m−1)/2 pairs. Pair counts published next
      // to the times so the ratio reads as output volume, not noise.
      val fpHot = Dedup.contentFpOf(Tables.documents(spark, hotDir)).persist()
      fpHot.count()
      val capDefault = Dedup.ContentEqGroupCap
      val tCapped = (1 to 2).map(_ =>
        time(noopWrite(Dedup.contentEqPairs(fpHot, capDefault)))).min
      val cappedPairs = Dedup.contentEqPairs(fpHot, capDefault).count()
      val capLifted = (hotCopies + 1).toInt
      val tUncapped =
        time(noopWrite(Dedup.contentEqPairs(fpHot, capLifted)))
      val viralPairs = hotCopies * (hotCopies - 1) / 2
      fpHot.unpersist(blocking = false)
      println(
        s"""{"metric":"audit_group_cap","hot_copies":$hotCopies,""" +
          s""""cap":$capDefault,"capped_sec":${f2(tCapped)},""" +
          s""""capped_pairs":$cappedPairs,""" +
          s""""uncapped_sec":${f2(tUncapped)},""" +
          s""""uncapped_viral_pairs":$viralPairs}""")
    }

    // Eleventh phase (`relational100`): the direct 100× sweep for the
    // relational prefix — the one family whose scale evidence stopped
    // at 10× (sf0.01 → sf0.1). Generates the seven TPC-H-ish tables at
    // `SPARK_GRAFT_REL_FACTOR`× the sf0.1 cardinalities (default 100 →
    // lineitem 60M rows) with the driver testdata's schemas, key
    // relationships, and value domains, then sweeps q01–q19 + q47–q49 +
    // q134 at both scales (two interleaved passes, min).
    if (phase == "relational100" || phase == "both") {
      val relDir = s"$out/rel100"
      val factor = sys.env.getOrElse("SPARK_GRAFT_REL_FACTOR", "100").toLong
      if (!Files.exists(Paths.get(s"$relDir/lineitem.parquet")))
        ScaleData.generateRelational(spark, relDir, factor)
      val relNames = RelationalNames ++ Seq(
        "q10_no_bigorder_anti", "q11_rollup_flags", "q12_priority_case",
        "q13_order_count_dist", "q14_promo_share", "q15_top_supplier",
        "q16_supplier_cnt", "q17_small_qty_rev", "q18_large_orders",
        "q19_band_join", "q47_set_ops", "q48_date_math", "q49_salted_agg",
        "q230_trailing_revenue", "q231_fk_orphans")
      def sweepRel(dir: String): Map[String, Double] = {
        val passes = (1 to 2).map(_ =>
          relNames.map(n => time(noopWrite(SparkEntry.queries(n)(spark, dir)))))
        relNames.zipWithIndex
          .map { case (n, i) => n -> passes.map(_(i)).min }.toMap
      }
      val tBase = sweepRel(base)
      val tBig = sweepRel(relDir)
      val qs = relNames.map { n =>
        val (a, b) = (tBase(n), tBig(n))
        s""""$n":[${f3(a)},${f3(b)},${f2(b / a)}]"""
      }.mkString("{", ",", "}")
      val (sumA, sumB) = (tBase.values.sum, tBig.values.sum)
      println(
        s"""{"metric":"relational_scale_ratio","base":"$base",""" +
          s""""scaled":"$relDir","factor":$factor,""" +
          s""""rows":{"lineitem":[600000,${600000L * factor}],""" +
          s""""orders":[150000,${150000L * factor}]},""" +
          s""""total":[${f3(sumA)},${f3(sumB)},${f2(sumB / sumA)}],""" +
          s""""queries":$qs}""")
    }

    // Thirteenth phase (`partition`): pruned-vs-unpruned wall-clock on
    // the 100× harnesses under the date/source-PARTITIONED warehouse
    // layout (round-14 verdict task 2 — the 100 TB claim's biggest
    // untested assumption). For each fact family the SAME query runs
    // against a flat alias (derived date column, full scan) and the
    // `_part` layout (PartitionFilters / DPP at the file listing):
    // q05 over 100× orders, q248/q249 over the 10M-event log, and a
    // source-bounded profile over the 500k-doc corpus. Two alternating
    // passes each, min.
    if (phase == "partition" || phase == "both") {
      val relDir = s"$out/rel100"
      val factor = sys.env.getOrElse("SPARK_GRAFT_REL_FACTOR", "100").toLong
      if (!Files.exists(Paths.get(s"$relDir/lineitem.parquet")))
        ScaleData.generateRelational(spark, relDir, factor)
      val evDir = s"$out/ev100"
      if (!Files.exists(Paths.get(s"$evDir/events.parquet")))
        ScaleData.generateEvents(spark, evDir,
          sys.env.getOrElse("SPARK_GRAFT_SCALE_EVENTS", "10000000").toLong,
          sys.env.getOrElse("SPARK_GRAFT_SCALE_USERS", "150000").toLong)
      val docDir = s"$out/sf1"
      if (!Files.exists(Paths.get(s"$docDir/documents.parquet")))
        ScaleData.generate(spark, docDir, nDocs, nEmb)
      // Flat aliases: symlink ONLY the flat tables, so re-runs against
      // an already-partitioned dir still measure the unpruned plan.
      def flatAlias(src: String): String = {
        val d = java.nio.file.Files.createTempDirectory("graft_flat_")
        new java.io.File(src).listFiles()
          .filter(f => f.getName.endsWith(".parquet"))
          .foreach { f =>
            java.nio.file.Files.createSymbolicLink(
              d.resolve(f.getName), f.toPath)
          }
        d.toString
      }
      for (d <- Seq(relDir, evDir, docDir))
        if (!Files.exists(Paths.get(s"$d/orders_part")) &&
            !Files.exists(Paths.get(s"$d/events_part")) &&
            !Files.exists(Paths.get(s"$d/documents_part")))
          ScaleData.generatePartitioned(spark, d)
      val relFlat = flatAlias(relDir)
      val evFlat = flatAlias(evDir)
      val docFlat = flatAlias(docDir)
      def docProfile(dir: String): DataFrame = {
        val docs =
          if (Files.exists(Paths.get(s"$dir/documents_part")))
            spark.read.parquet(s"$dir/documents_part")
          else spark.read.parquet(s"$dir/documents.parquet")
        docs.filter(org.apache.spark.sql.functions.col("source") === "src7")
          .groupBy("lang")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum("n_chars").as("chars"))
      }
      val legs = Seq(
        ("q05_orders_100x", relFlat, relDir,
          (d: String) => SparkEntry.queries("q05_local_supplier")(spark, d)),
        ("q248_events_10M", evFlat, evDir,
          (d: String) => SparkEntry.queries("q248_window_report")(spark, d)),
        ("q249_events_10M_dpp", evFlat, evDir,
          (d: String) => SparkEntry.queries("q249_peak_day_drill")(spark, d)),
        ("docs_source_profile_500k", docFlat, docDir,
          (d: String) => docProfile(d)),
        ("q250_docs_dpp_500k", docFlat, docDir,
          (d: String) => SparkEntry.queries("q250_hot_source_drill")(spark, d)))
      val results = legs.map { case (name, flat, part, mk) =>
        val times = (1 to 2).map { _ =>
          (time(noopWrite(mk(flat))), time(noopWrite(mk(part))))
        }
        val tf = times.map(_._1).min
        val tp = times.map(_._2).min
        // plan evidence: the partitioned run must carry PartitionFilters
        val planStr = mk(part).queryExecution.executedPlan.toString
        val pruned = planStr.contains("PartitionFilters: [") &&
          (planStr.contains("o_month") || planStr.contains("day#") ||
            planStr.contains("source#"))
        s""""$name":{"flat_sec":${f2(tf)},"partitioned_sec":${f2(tp)},""" +
          s""""speedup":${f2(tf / tp)},"partition_filters":$pruned}"""
      }
      println(s"""{"metric":"partition_pruning",${results.mkString(",")}}""")
    }

    // Fourteenth phase (`nearident`): q252's scale-regime evidence
    // (round-16 verdict task 1). Generates a ×400 embedding corpus
    // (default 800k vectors; docs stay small — only embeddings matter
    // here), runs the PRODUCTION cell-blocked listing (τ = 0.95,
    // 2×32-bit bands) at sf0.1 and at ×400, and audits recall against
    // the generator's planted near-identical twins (every id with
    // id % 100 == 7 duplicates id−1 plus ±0.001 jitter). The r16 q40
    // reference at the same corpus: 121.8 s (×185) — the number this
    // phase exists to retire for the near-identical regime.
    if (phase == "nearident" || phase == "both") {
      import org.apache.spark.sql.functions.col
      val niDir = s"$out/x400emb"
      val niEmb =
        sys.env.getOrElse("SPARK_GRAFT_NEARIDENT_EMB", "800000").toLong
      if (!Files.exists(Paths.get(s"$niDir/embeddings.parquet")))
        ScaleData.generate(spark, niDir, 20000L, niEmb)
      def run1(dir: String): (Double, Long) = {
        val t = (1 to 2).map(_ =>
          time(noopWrite(Similarity.cellBlockedNearDup(spark, dir)))).min
        (t, Similarity.cellBlockedNearDup(spark, dir).count())
      }
      val (tBase, nBase) = run1(base)
      val (tBig, nBig) = run1(niDir)
      val found = Similarity.cellBlockedNearDup(spark, niDir)
        .select(col("a_id"), col("b_id"))
      val truth = spark.range(0, niEmb).toDF("id")
        .filter(col("id") % 100 === 7 && col("id") > 0)
        .select((col("id") - 1).as("a_id"), col("id").as("b_id"))
      val nTruth = truth.count()
      val hit = truth.join(found, Seq("a_id", "b_id"), "left_semi").count()
      // the trilogy's PRODUCT step at production knobs: pairs → CC →
      // keep/canonical decisions over the whole ×400 corpus
      val td = time(noopWrite(
        Similarity.nearIdenticalDecisions(spark, niDir)))
      val dropped = Similarity.nearIdenticalDecisions(spark, niDir)
        .filter(!org.apache.spark.sql.functions.col("keep")).count()
      println(
        s"""{"metric":"nearident_scale","base":"$base","scaled":"$niDir",""" +
          s""""emb_rows":[2000,$niEmb],""" +
          s""""wall_sec":[${f3(tBase)},${f3(tBig)},${f2(tBig / tBase)}],""" +
          s""""pairs":[$nBase,$nBig],"planted":$nTruth,""" +
          s""""planted_found":$hit,""" +
          s""""recall":${String.format(java.util.Locale.ROOT, "%.4f",
            Double.box(hit.toDouble / nTruth))},""" +
          s""""decisions_sec":${f3(td)},"dropped":$dropped}""")
    }

    // Fifteenth phase (`semguard`): q77 at DEFAULT knobs on the ×400
    // embedding corpus (round-16 verdict task 2 — the configuration
    // that OOM'd a 64 GB heap in r16 via the uncapped edge-list
    // localCheckpoint). With the pre-flight pair-budget guard this run
    // must COMPLETE: the phase reports the guard's decision (the
    // auto-applied degree budget), the wall clock, and the decision
    // table's keep counts.
    if (phase == "semguard" || phase == "both") {
      import org.apache.spark.sql.functions.col
      val niDir = s"$out/x400emb"
      val niEmb =
        sys.env.getOrElse("SPARK_GRAFT_NEARIDENT_EMB", "800000").toLong
      if (!Files.exists(Paths.get(s"$niDir/embeddings.parquet")))
        ScaleData.generate(spark, niDir, 20000L, niEmb)
      val cap = Similarity.semDedupAutoCap(spark, niDir)
      val t = time(noopWrite(
        SparkEntry.queries("q77_semantic_dedup")(spark, niDir)))
      val q77 = SparkEntry.queries("q77_semantic_dedup")(spark, niDir)
      val total = q77.count()
      val dropped = q77.filter(!col("keep")).count()
      println(
        s"""{"metric":"semguard","scaled":"$niDir","emb_rows":$niEmb,""" +
          s""""auto_cap":${cap.map(_.toString).getOrElse("null")},""" +
          s""""wall_sec":${f3(t)},"rows":$total,"dropped":$dropped}""")
    }

    // Twelfth phase (`relskew`): PLANTED relational key skew + AQE
    // evidence (round-14 verdict task 7). Regenerates the 100× harness
    // with `hotCustomerShare`=0.5 — half of all orders owned by
    // customer 0 — so the orders⋈customer shuffle joins in q05 and
    // q232 concentrate half their rows on ONE key (customer outgrows
    // broadcast at this factor: 1.5M × 3 cols). Measures both queries
    // with AQE's OptimizeSkewedJoin on vs off (two alternating passes,
    // min) and PINS the plan evidence: with AQE on, the executed plan
    // must carry a `skew=true` SortMergeJoin.
    if (phase == "relskew" || phase == "both") {
      val dir = s"$out/rel100skew"
      val factor = sys.env.getOrElse("SPARK_GRAFT_REL_FACTOR", "100").toLong
      if (!Files.exists(Paths.get(s"$dir/lineitem.parquet")))
        ScaleData.generateRelational(spark, dir, factor,
          hotCustomerShare = 0.5)
      val SkewConf = "spark.sql.adaptive.skewJoin.enabled"
      // The hot partition here is ~7.5M narrow rows ≈ 120 MB — real
      // skew (16× the median partition) but UNDER AQE's default 256 MB
      // skewedPartitionThresholdInBytes, so at harness scale the
      // mechanism never fires on defaults. Scale the byte thresholds
      // down with the data — 8m/4m vs the 256m/64m defaults (a 100 TB deployment's hot partition is
      // 1000× this and trips the DEFAULTS; the factor-5-over-median
      // trigger is what actually detects the skew and is left alone).
      val ThresholdConf =
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
      val AdvisoryConf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
      val BcastConf = "spark.sql.autoBroadcastJoinThreshold"
      val names = Seq("q05_local_supplier", "q232_returned_revenue")
      // Three regimes per query. (1) DEFAULT: the planner broadcasts
      // the unhinted customer dimension, so the hot custkey never
      // crosses a shuffle — broadcast IS the first skew defense, and
      // the probe proves q05/q232 are structurally immune while the
      // dimension fits. (2)/(3) autoBroadcast=-1 — the regime a true
      // warehouse customer table is in (the explicitly-hinted tiny
      // dims keep their hints) — with AQE's OptimizeSkewedJoin on vs
      // off: the only regime where key skew can exist, and where the
      // split must fire.
      def run1(n: String, skew: Boolean, bcast: Boolean): Double = {
        spark.conf.set(SkewConf, skew.toString)
        spark.conf.set(ThresholdConf, "8m")
        spark.conf.set(AdvisoryConf, "4m")
        if (!bcast) spark.conf.set(BcastConf, "-1")
        try time(noopWrite(SparkEntry.queries(n)(spark, dir)))
        finally {
          spark.conf.set(SkewConf, "true")
          spark.conf.unset(ThresholdConf)
          spark.conf.unset(AdvisoryConf)
          spark.conf.unset(BcastConf)
        }
      }
      val t = (1 to 2).map(_ => names.map(n => (
        run1(n, skew = true, bcast = true),
        run1(n, skew = true, bcast = false),
        run1(n, skew = false, bcast = false))))
      // Plan pin: in the shuffle regime with AQE on, EXECUTE the same
      // QueryExecution (collect — outputs are report-sized; noop write
      // plans a separate QueryExecution whose AQE never runs) and read
      // the final adaptive plan for the skew=true split marker.
      val pinned = names.map { n =>
        spark.conf.set(ThresholdConf, "8m")
        spark.conf.set(AdvisoryConf, "4m")
        spark.conf.set(BcastConf, "-1")
        try {
          val df = SparkEntry.queries(n)(spark, dir)
          df.collect()
          n -> df.queryExecution.executedPlan.toString.contains("skew=true")
        } finally {
          spark.conf.unset(ThresholdConf)
          spark.conf.unset(AdvisoryConf)
          spark.conf.unset(BcastConf)
        }
      }.toMap
      val legs = names.zipWithIndex.map { case (n, i) =>
        val bc = t.map(_(i)._1).min
        val aqe = t.map(_(i)._2).min
        val no = t.map(_(i)._3).min
        s""""$n":{"broadcast_default_sec":${f2(bc)},""" +
          s""""shuffle_aqe_sec":${f2(aqe)},"shuffle_noaqe_sec":${f2(no)},""" +
          s""""aqe_speedup":${f2(no / aqe)},"skew_plan":${pinned(n)}}"""
      }.mkString(",")
      println(
        s"""{"metric":"relational_skew","factor":$factor,""" +
          s""""hot_customer_share":0.5,$legs}""")
    }

    // (`factskew`): FACT-FACT key skew — round-15 verdict task 5,
    // closing relskew's honest gap: the customer-side skew above is
    // dimension-join skew, which broadcast structurally absorbs while
    // the dimension fits; here the hot key sits in the orders⋈lineitem
    // ORDERKEY join, where both sides are 100×-factor facts (15M / 72M
    // rows) and NEITHER can broadcast at any threshold — AQE's
    // OptimizeSkewedJoin is the only defense. The harness plants a
    // viral order (l_orderkey=0 carrying SPARK_GRAFT_SCALE_HOTLINES
    // extra lines, default 12M ≈ 6× the median shuffle partition) and
    // measures the join+aggregate with the split on vs off (two
    // alternating passes, min), pinning BOTH plan facts: skew=true on
    // the SortMergeJoin, and no broadcast on the orderkey join.
    if (phase == "factskew" || phase == "both") {
      val dir = s"$out/factskew"
      val factor = sys.env.getOrElse("SPARK_GRAFT_REL_FACTOR", "100").toLong
      val hotLines =
        sys.env.getOrElse("SPARK_GRAFT_SCALE_HOTLINES", "12000000").toLong
      if (!Files.exists(Paths.get(s"$dir/lineitem.parquet")))
        ScaleData.generateFactSkew(spark, dir, factor, hotLines)
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      // The probe join: per-priority line counts + quantity mass over
      // orders⋈lineitem — the one aggregate that forces the full
      // fact-fact shuffle and nothing else.
      def factJoin(): DataFrame =
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .join(Tables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_quantity")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast("long")).as("qty"))
      val SkewConf = "spark.sql.adaptive.skewJoin.enabled"
      // Same scaled-down byte thresholds as relskew (8m/4m vs the
      // 256m/64m defaults): the harness's hot partition is ~0.5 GB of
      // a 100 TB deployment's multi-GB one; the factor-5-over-median
      // trigger that actually DETECTS the skew is left at its default.
      val ThresholdConf =
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
      val AdvisoryConf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
      // Straggler evidence at TASK granularity: at harness scale the
      // fact-fact probe is map-bound (the 87M-row scan+shuffle-write is
      // the same in both regimes), so total wall understates what the
      // split buys — the honest figure is the longest SHUFFLE-READ task
      // (the hot reduce partition vs its advisory-sized splits), which
      // is exactly the number that becomes the job's wall-clock once a
      // real cluster's map side scales out.
      class MaxReduceTask extends org.apache.spark.scheduler.SparkListener {
        @volatile var maxMs = 0L
        @volatile var ended = 0L
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null && m.shuffleReadMetrics != null &&
              m.shuffleReadMetrics.totalBytesRead > 0 &&
              t.taskInfo.duration > maxMs)
            maxMs = t.taskInfo.duration
          ended += 1
        }
        /** Deterministic drain: the listener bus delivers task-end
          * events asynchronously, so poll until the ended-task count
          * stabilizes (two consecutive identical reads) instead of a
          * fixed sleep that under-reads the straggler under load. */
        def awaitQuiesce(maxWaitMs: Long = 10000): Unit = {
          val deadline = System.nanoTime() + maxWaitMs * 1000000L
          var prev = -1L
          while (prev != ended && System.nanoTime() < deadline) {
            prev = ended
            Thread.sleep(100)
          }
        }
      }
      def run1(skew: Boolean): (Double, Double) = {
        spark.conf.set(SkewConf, skew.toString)
        spark.conf.set(ThresholdConf, "8m")
        spark.conf.set(AdvisoryConf, "4m")
        val l = new MaxReduceTask
        spark.sparkContext.addSparkListener(l)
        try {
          val w = time(noopWrite(factJoin()))
          l.awaitQuiesce()
          (w, l.maxMs / 1000.0)
        } finally {
          spark.sparkContext.removeSparkListener(l)
          spark.conf.set(SkewConf, "true")
          spark.conf.unset(ThresholdConf)
          spark.conf.unset(AdvisoryConf)
        }
      }
      val t = (1 to 2).map(_ => (run1(skew = true), run1(skew = false)))
      val aqe = t.map(_._1._1).min
      val no = t.map(_._2._1).min
      val aqeTask = t.map(_._1._2).min
      val noTask = t.map(_._2._2).min
      // Plan pins on an EXECUTED adaptive plan (collect — the output is
      // 5 rows): the split fired, and no side of the orderkey join
      // broadcast.
      val (skewPin, bcastFree) = {
        spark.conf.set(ThresholdConf, "8m")
        spark.conf.set(AdvisoryConf, "4m")
        try {
          val df = factJoin()
          df.collect()
          val plan = df.queryExecution.executedPlan.toString
          (plan.contains("skew=true"),
            plan.contains("SortMergeJoin") &&
              !plan.contains("BroadcastHashJoin"))
        } finally {
          spark.conf.unset(ThresholdConf)
          spark.conf.unset(AdvisoryConf)
        }
      }
      println(
        s"""{"metric":"fact_skew","factor":$factor,"hot_lines":$hotLines,""" +
          s""""aqe_sec":${f2(aqe)},"noaqe_sec":${f2(no)},""" +
          s""""aqe_speedup":${f2(no / aqe)},""" +
          s""""max_reduce_task_aqe_sec":${f2(aqeTask)},""" +
          s""""max_reduce_task_noaqe_sec":${f2(noTask)},""" +
          s""""straggler_speedup":${f2(noTask / aqeTask)},""" +
          s""""skew_plan":$skewPin,"broadcast_free":$bcastFree}""")
    }

    // Tenth phase (`events100`): the direct 100× sweep for the
    // session/event analytics family (round-12 verdict task 4). The
    // driver tables cap the family's scale evidence at 10× (sf0.01 →
    // sf0.1); this generates a 10M-event / 150k-user corpus (100× the
    // sf0.1 rows AND state cardinality) and sweeps the sessionize-once
    // stack, the transition/stationary kernels, and the report family
    // at both scales, then re-drives the two stateful streaming event
    // monitors over the 100× corpus so their per-user frontier state
    // is measured at 100× keys.
    if (phase == "events100" || phase == "both") {
      val evDir = s"$out/ev100"
      val nEv = sys.env.getOrElse("SPARK_GRAFT_SCALE_EVENTS", "10000000").toLong
      val nUsers = sys.env.getOrElse("SPARK_GRAFT_SCALE_USERS", "150000").toLong
      if (!Files.exists(Paths.get(s"$evDir/events.parquet")))
        ScaleData.generateEvents(spark, evDir, nEv, nUsers)
      val famNames = sys.env.get("SPARK_GRAFT_EVENTS_NAMES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq(
          "q191_event_transitions", "q192_entry_sessions", "q194_survival",
          "q195_stationary", "q199_seasonality", "q200_period_scan",
          "q201_cadence_cv", "q202_growth_accounting", "q203_session_funnel",
          "q205_seq_support", "q206_conversion_latency", "q207_dwell_share",
          "q208_entry_exit", "q210_session_paths", "q211_return_latency",
          "q212_depth_by_entry", "q216_weekly_cohorts", "q217_ltv_deciles",
          "q221_error_streaks", "q223_gap_tail_quantiles",
          "q229_entry_value", "q235_peak_concurrency", "q236_user_gini",
          "q243_weekday_profile"))
      def sweepEv(dir: String): Map[String, Double] = {
        val passes = (1 to 2).map(_ =>
          famNames.map(n => time(noopWrite(SparkEntry.queries(n)(spark, dir)))))
        famNames.zipWithIndex
          .map { case (n, i) => n -> passes.map(_(i)).min }.toMap
      }
      val tBase = sweepEv(base)
      val tBig = sweepEv(evDir)
      val qs = famNames.map { n =>
        val (a, b) = (tBase(n), tBig(n))
        s""""$n":[${f3(a)},${f3(b)},${f2(b / a)}]"""
      }.mkString("{", ",", "}")
      val (sumA, sumB) = (tBase.values.sum, tBig.values.sum)
      println(
        s"""{"metric":"events_scale_ratio","base":"$base","scaled":"$evDir",""" +
          s""""rows":{"events":[100000,$nEv],"users":[1500,$nUsers]},""" +
          s""""total":[${f3(sumA)},${f3(sumB)},${f2(sumB / sumA)}],""" +
          s""""queries":$qs}""")

      // Streaming monitors at 100× state cardinality: same staging and
      // drive discipline as the `streaming` phase (time-range-
      // partitioned files, one micro-batch each).
      import graft.streaming.{EventStreams, GrowthStreams, SessionStreams, TransitionStreams}
      import spark.implicits._
      val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
      val evStage = s"$out/stream_ev100_$batches"
      if (!Files.exists(Paths.get(evStage)))
        spark.read.parquet(s"$evDir/events.parquet")
          .repartitionByRange(batches,
            org.apache.spark.sql.functions.col("ts"))
          .write.parquet(evStage)
      val evRows = spark.read.parquet(evStage).count()
      def evSrc() = spark.readStream
        .schema(spark.read.parquet(evStage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(evStage)
        .as[EventStreams.EventRow]
      def driveEv(start: ((DataFrame, Long) => Unit) =>
          org.apache.spark.sql.streaming.StreamingQuery): (Double, Long) = {
        val done = new java.util.concurrent.atomic.AtomicLong(0L)
        val t0 = System.nanoTime()
        val q = start { (scored, _) => done.addAndGet(scored.count()); () }
        try { q.processAllAvailable() } finally q.stop()
        ((System.nanoTime() - t0) / 1e9, done.get())
      }
      val (tSec, tRows) = driveEv(cb =>
        TransitionStreams.transitions(evSrc()).toDF().writeStream
          .outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) => cb(b, id)).start())
      val (gSec, gRows) = driveEv(cb =>
        GrowthStreams.dayClasses(evSrc()).toDF().writeStream
          .outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) => cb(b, id)).start())
      val (sSec, sRows) = driveEv(cb =>
        SessionStreams.closedSessions(evSrc()).toDF().writeStream
          .outputMode("append")
          .foreachBatch((b: DataFrame, id: Long) => cb(b, id)).start())
      println(
        s"""{"metric":"streaming_events_100x","in_rows":$evRows,""" +
          s""""batches":$batches,""" +
          s""""transition_monitor":{"sec":${f2(tSec)},"out_rows":$tRows,""" +
          s""""rows_per_sec":${f2(evRows / tSec)}},""" +
          s""""growth_monitor":{"sec":${f2(gSec)},"out_rows":$gRows,""" +
          s""""rows_per_sec":${f2(evRows / gSec)}},""" +
          s""""session_panel":{"sec":${f2(sSec)},"out_rows":$sRows,""" +
          s""""rows_per_sec":${f2(evRows / sSec)}}}""")
    }
    Features.clear(spark)
    spark.stop()
  }
}
