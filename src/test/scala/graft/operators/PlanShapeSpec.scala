package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, SparkEntry}

/** Physical-plan regression guards: the properties that make these
  * queries survive a 100× scale-up are plan shapes, not row counts —
  * pushdown reaching the scan, pruned read schemas, broadcast dimension
  * joins, no accidental Cartesian products. A code change that silently
  * loses one of these still passes value-equality tests; these specs
  * fail it. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkSpec.Sf0001)
      .queryExecution.executedPlan.toString

  /** COLD physical tree, pre-AQE (`sparkPlan`): the build-shape pins on
    * session-memoized queries (q100/q175/q176/q182…) must not depend on
    * cache state, and cache state leaks two ways — the cacheManager is
    * shared across ALL sessions of the context (a fresh session still
    * picks up live InMemoryRelations, whose plan STRING then embeds the
    * cached child plan and double-counts nodes), and `cachedFrame`
    * persists during CONSTRUCTION (even a first build plans as an
    * InMemoryRelation boundary that hides its nodes from tree
    * traversal). So: a fresh session with stage memoization OFF, over a
    * symlink alias of the sf0.001 tables so no shared-session cache
    * fragment can match by path. The result is the true first-build
    * plan, every time, whatever ran before. */
  private lazy val coldDir: String = {
    val d = java.nio.file.Files.createTempDirectory("planshape_")
    new java.io.File(SparkSpec.Sf0001).listFiles().foreach { f =>
      java.nio.file.Files.createSymbolicLink(d.resolve(f.getName), f.toPath)
    }
    d.toString
  }

  private def freshTree(name: String)
      : org.apache.spark.sql.execution.SparkPlan = {
    val s = spark.newSession()
    s.conf.set(Features.CacheModeConf, "off")
    // a bare newSession starts with an empty custom-function registry;
    // queries self-register against their OWN session, and setActive
    // covers any helper that resolves through the active one
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try SparkEntry.queries(name)(s, coldDir).queryExecution.sparkPlan
    finally {
      Features.clear(s)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  private def treeCount(p: org.apache.spark.sql.execution.SparkPlan,
      node: String): Int =
    p.collect { case n if n.nodeName == node => n }.size

  private def treeHas(p: org.apache.spark.sql.execution.SparkPlan,
      node: String): Boolean =
    p.collect { case n if n.nodeName.contains(node) => n }.nonEmpty

  test("q06: filters are pushed into the lineitem scan; schema is pruned") {
    val scan = plan("q06_forecast_revenue").linesIterator
      .find(_.contains("FileScan parquet")).get
    scan should include("l_shipdate")       // pushed filter visible at scan
    scan should include("PushedFilters: [IsNotNull")
    // projection pruning: none of the unused wide columns are read
    scan should not include "l_comment"
    scan should not include "l_returnflag"
  }

  test("q01: only the seven needed lineitem columns are scanned") {
    // Inspect the scan's actual output schema (the toString form
    // truncates; sparkPlan because the AQE wrapper hides children).
    val scan = SparkEntry.queries("q01_pricing_summary")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    val cols = scan.output.map(_.name).toSet
    cols shouldBe Set("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
  }

  test("q02: dimension joins are broadcast, never shuffled; the fact " +
      "side aggregates PER ORDER before any join (eager-aggregation " +
      "reassociation - measured x21.8 -> x4.8 at the 100x relational " +
      "sweep)") {
    val p = plan("q02_revenue_by_nation")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    // the 60M-row fact table never reaches a join un-aggregated
    p should include("keys=[l_orderkey")
  }

  test("q05: six-way star join plans without a Cartesian product") {
    val p = plan("q05_local_supplier")
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
  }

  test("q04/q10: EXISTS/NOT EXISTS plan as semi/anti joins") {
    plan("q04_priority_exists") should include("LeftSemi")
    plan("q10_no_bigorder_anti") should include("LeftAnti")
  }

  test("dedup/similarity self-joins never degrade to Cartesian products") {
    Seq("q35_minhash_lsh", "q36_simhash", "q37_shingle_jaccard",
      "q39_lsh_ann", "q40_embedding_neardup").foreach { q =>
      withClue(q) { plan(q) should not include "CartesianProduct" }
    }
  }

  test("q38/q44: the deliberate cross join broadcasts the tiny query set") {
    Seq("q38_cosine_topk", "q44_ivf_ann").foreach { q =>
      withClue(q) {
        val p = plan(q)
        p should include("Broadcast") // BNLJ/BHJ with broadcast build side
        p should not include "CartesianProduct"
      }
    }
  }

  test("q72: bloom membership filters sit BELOW every exchange — " +
      "definite-miss rows are dropped at scan position, pre-shuffle") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val p = SparkEntry.queries("q72_bloom_incremental")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan
    val bloomFilters = p.collect {
      case f: FilterExec if f.condition.find(
        _.isInstanceOf[graft.functions.BloomMightContain]).isDefined => f
    }
    bloomFilters should not be empty // both the fp and the band probe
    // No exchange below any bloom filter: the prune happens before the
    // rows ever shuffle toward a corpus join.
    bloomFilters.foreach { f =>
      f.child.collectFirst { case e: Exchange => e } shouldBe None
    }
  }

  test("q73: the benchmark shingle postings broadcast; the training side " +
      "never shuffles for the hit join") {
    val p = plan("q73_decontamination")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("q77: decision join reads memoized labels from cache; no " +
      "Cartesian product") {
    val p = plan("q77_semantic_dedup")
    p should include("InMemoryTableScan") // the cached CC label table
    p should not include "CartesianProduct"
  }

  test("q44: cell assignment is a hash argmax, not a window or sort " +
      "aggregate") {
    val p = plan("q44_ivf_ann")
    p should include("ObjectHashAggregate") // graft_argmax runs hash-based
    p should not include "SortAggregate"
  }

  test("q41: centroids aggregate without a positional explode") {
    // The one-pass 64-sum form must not regress to posexplode (n×64-row
    // Generate) + shuffled join-backs.
    val p = plan("q41_label_centroids")
    p should not include "Generate"
    p should include("BroadcastHashJoin") // centroid table broadcast back
  }

  test("q57/q58/q61/q62: new analytics plan without Cartesian products") {
    Seq("q57_tfidf_terms", "q58_scalar_quant", "q61_length_quantiles",
      "q62_profile").foreach { q =>
      withClue(q) { plan(q) should not include "CartesianProduct" }
    }
  }

  test("q58: the stats row is broadcast to the quantize pass") {
    plan("q58_scalar_quant") should include("Broadcast")
  }

  test("q58: the quantize-error map stage runs inside whole-stage codegen") {
    // The interpreted HOF form (aggregate/transform lambdas) sat outside
    // codegen and was the #2 bench cost; the native QuantizeError
    // expression must keep the map stage fused. Execute first: under AQE
    // the codegen stars only appear in the final plan.
    val df = SparkEntry.queries("q58_scalar_quant")(spark, SparkSpec.Sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.toLowerCase.contains("quantizeerror")).get
    line should include("*(") // WholeStageCodegen span marker
  }

  test("q79: k-means assignment is the q44 hash-argmax shape — broadcast " +
      "seeds, ObjectHashAggregate, no window sort, no Cartesian product") {
    val p = plan("q79_kmeans_step")
    p should include("Broadcast")           // 8-row seed table
    p should include("ObjectHashAggregate") // graft_argmax assignment
    p should not include "SortAggregate"
    p should not include "Window"           // no row_number fallback
    p should not include "CartesianProduct"
  }

  test("q80: repetition gate is one partial-aggregable distinct aggregate " +
      "over the cached shingle features — no join, no Cartesian product") {
    val p = plan("q80_repetition")
    p should include("HashAggregate")
    p should not include "CartesianProduct"
    p should not include "Join" // count+distinct fold, not a self-join
  }

  test("q81: boilerplate top-k plans as TakeOrderedAndProject over a " +
      "partial aggregate — per-partition heaps, never a global sort") {
    val p = plan("q81_boilerplate")
    p should include("TakeOrderedAndProject")
    p should include("HashAggregate")
    p should not include "CartesianProduct"
  }

  test("q82: source-overlap sizes join by broadcast; no Cartesian product") {
    val p = plan("q82_source_overlap")
    p should include("Broadcast")
    p should not include "CartesianProduct"
  }

  test("q83: split assignment is one stateless projection + one " +
      "partial-aggregable groupBy — no join anywhere") {
    val p = plan("q83_split_assign")
    p should include("HashAggregate")
    p should not include "Join"
    p should not include "CartesianProduct"
  }

  test("q84: per-source funnel groups the shared flag stage — " +
      "one aggregate, no Cartesian product") {
    val p = plan("q84_source_funnel")
    p should include("HashAggregate")
    p should not include "CartesianProduct"
  }

  test("CC label consumers plan against lineage-cut leaves, not the " +
      "embedded fixpoint tree") {
    // Round-5 regression guard: ccLabelsAuto's converged path must
    // return a localCheckpoint leaf. With a plain persisted frame, the
    // InMemoryRelation nests every fixpoint round plus the full
    // candidate-join lineage, and every consumer re-walks that tree on
    // the driver at EVERY execution (measured: q78 3 s wall / 8 ms of
    // task work at sf0.1). The leaf shows up as Scan ExistingRDD; the
    // banded self-join markers must be gone from consumer plans.
    Seq("q60_dedup_decisions", "q78_curation_funnel",
        "q84_source_funnel", "q92_extended_funnel").foreach { q =>
      withClue(q) {
        val p = plan(q)
        p should include("Scan ExistingRDD")
        p should not include "x_bh" // q35's band-join key never leaks in
      }
    }
  }

  test("q85: span dedup is hash aggregates + ONE consumption of the " +
      "window-hash stream (cross-doc test is a count over the h " +
      "partition — the r17 shape; the former semi join planned the " +
      "ngram explode twice) — no Cartesian product, no pair join") {
    val p = plan("q85_span_dedup")
    p should include("HashAggregate")
    p should include("Window")
    p should not include "LeftSemi"
    p should not include "CartesianProduct"
    // one ngram fan-out, not two: the Generate node appears once
    p.sliding("Generate".length).count(_ == "Generate") shouldBe 1
  }

  test("q86: BM25 pushes the query-term filter below the tf aggregate " +
      "and broadcasts df/stats; top-k is a TakeOrderedAndProject") {
    val p = plan("q86_bm25")
    p should include("TakeOrderedAndProject")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    // the isin(query terms) filter must sit below the first aggregate:
    // find the Filter mentioning the term literal, ensure one exists
    p should include("dup")
  }

  test("q87: LM quality ends in a TakeOrderedAndProject worst-k, " +
      "broadcasts the per-lang totals, no Cartesian product") {
    val p = plan("q87_lm_quality")
    p should include("TakeOrderedAndProject")
    p should include("Broadcast")
    p should not include "CartesianProduct"
  }

  test("q88: containment rides the q37 candidate machinery — " +
      "inverted-index join, never a Cartesian product") {
    val p = plan("q88_containment")
    p should not include "CartesianProduct"
    p should include("TakeOrderedAndProject")
  }

  test("q89: EVERY gate is a per-row expression in the default " +
      "broadcast-LM mode — the xent leg is graft_lm_xent at scan " +
      "position (no explode, no join, no shuffle before the final " +
      "sort); join mode keeps its LM-totals broadcast") {
    val p = plan("q89_quality_gate")
    p should include("graft_lm_xent")
    p should not include "Generate"
    p should not include "CartesianProduct"
    p should include("array_distinct") // rep gate: per-row, inside a Project
    // the conf-gated join form retains its original audited shape
    val s = spark.newSession()
    s.conf.set(Features.LmScoringConf, "join")
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val j = SparkEntry.queries("q89_quality_gate")(s, SparkSpec.Sf0001)
        .queryExecution.executedPlan.toString
      j should include("Broadcast")
      j should not include "CartesianProduct"
      j should include("array_distinct")
    } finally {
      Features.clear(s)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("q90: sketch + exact quantiles fuse into ONE ObjectHashAggregate " +
      "pair — partial-aggregable, no sort, no window") {
    val p = plan("q90_sketch_quantiles")
    p should include("ObjectHashAggregate")
    p should not include "SortAggregate"
    p should not include "Window"
  }

  test("q91: the PMI pair generator is a doc_id-keyed equi-self-join — " +
      "never a Cartesian product; pair aggregate partial-aggregable") {
    val p = plan("q91_pmi_collocations")
    p should not include "CartesianProduct"
    p should include("HashAggregate")
    p should include("TakeOrderedAndProject")
  }

  test("q87: coarser LM aggregates derive from the tf aggregate and REUSE " +
      "its shuffle at runtime — one token explode, not three") {
    // Execute first: exchange reuse is an AQE runtime decision, invisible
    // in the static formatted plan. (q57's df side cannot reuse: column
    // pruning gives its tf subtree a different canonical form, so it
    // keeps the two-scan distinct formulation.)
    val df = SparkEntry.queries("q87_lm_quality")(spark, SparkSpec.Sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString should include("ReusedExchange")
  }

  test("q93: trending windows run over the aggregated hour×type frame — " +
      "the partial aggregate sits below both window sorts") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = SparkEntry.queries("q93_trending")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan
    // every Window node must have an aggregate somewhere beneath it:
    // the raw events are reduced BEFORE any sort a window implies
    plan.collect { case w: WindowExec => w }.foreach { w =>
      w.collectFirst { case a: BaseAggregateExec => a } should not be empty
    }
    plan.toString should not include "CartesianProduct"
  }

  test("q96: the sketch audit verifies only banded candidates — " +
      "no Cartesian, one final single-row aggregate") {
    val p = plan("q96_sketch_fidelity")
    p should not include "CartesianProduct"
    p should include("HashAggregate")
  }

  test("q97: the integrity audit's orphan checks are anti joins on the " +
      "uniform id key — no Cartesian between the data tables") {
    val p = plan("q97_integrity")
    p should include("LeftAnti")
    // the 1-row result frames combine via broadcast nested loop only
    p should not include "CartesianProduct"
  }

  test("q99: the Misra-Gries sketch runs hash-based (ObjectHashAggregate, " +
      "no sort), and the exact pass is pruned by a BROADCAST candidate " +
      "join at scan position") {
    val p = plan("q99_heavy_hitters")
    p should include("ObjectHashAggregate") // graft_heavy_hitters
    p should not include "SortAggregate"
    p should include("BroadcastHashJoin") // ≤ k-1 candidates per source
    p should not include "SortMergeJoin" // never a corpus-keyed shuffle join
  }

  test("q100: the drift monitor's global frame joins back by BROADCAST " +
      "and the per-source sums are partial-aggregable hash aggregates") {
    val p = freshTree("q100_embedding_drift")
    treeHas(p, "BroadcastNestedLoopJoin") shouldBe true // 1-row global frame
    treeHas(p, "HashAggregate") shouldBe true
    treeHas(p, "SortAggregate") shouldBe false
  }

  test("q101: the KL join is vocab-vs-vocab — every leg reads the " +
      "memoized (source, term) aggregate, and the totals sides " +
      "broadcast") {
    val df = SparkEntry.queries("q101_source_kl")(spark, SparkSpec.Sf0001)
    df.collect() // cache/stage shapes are AQE runtime decisions
    val p = df.queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin") // per-source totals
    p should not include "CartesianProduct"
    // All three consumers (counts probe, per-source totals, corpus
    // marginal) read the memoized Features.sourceTokenCounts cache —
    // the corpus-sized token explode runs ONCE, at cache build, and
    // never again in any leg. (Before the frame was shared this held
    // more weakly via ReusedExchange; the cache is the stronger form:
    // it also survives across queries in the suite.)
    // TableCacheQueryStage marks a LIVE read of the cache (the embedded
    // InMemoryRelation build plan prints without it), so >= 3 of them is
    // "all three legs hit the cache; no leg re-explodes the corpus".
    p.linesIterator.count(_.contains("TableCacheQueryStage")) should be >= 3
  }

  test("q102/q104: packing audit and chunker shuffle at most the " +
      "per-source window — never a global sort of the corpus") {
    val audit = plan("q102_packing_audit")
    audit should include("hashpartitioning(source") // window partition key
    val chunks = SparkEntry.queries("q104_chunking")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan
    // chunking is scan → generate → project: no aggregate, no join, and
    // no exchange except the output ordering's range partition
    chunks.toString should not include "HashAggregate"
    chunks.toString should not include "Join"
  }

  test("q107: the DSIR log-ratio artifact broadcasts into the scoring " +
      "join; training aggregates over the fixed bucket domain") {
    val p = plan("q107_dsir_weights")
    p should include("BroadcastHashJoin") // 256-row lr table
    p should not include "CartesianProduct"
    p should not include "SortAggregate"  // bucket groupBys hash-agg
  }

  test("q111: the epoch-shuffle plan has no join and no window — one " +
      "hash aggregate over epochs×shards cells") {
    val p = SparkEntry.queries("q111_epoch_shuffle")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan.toString
    p should not include "Join"
    p should not include "Window"
    p should include("HashAggregate")
  }

  test("q110: the corpus reaches the histogram only through one anti " +
      "join against the label ids — no pair machinery in the plan") {
    val p = plan("q110_dup_histogram")
    p should include("LeftAnti")
    p should not include "CartesianProduct"
  }

  test("q106/q113: codebook and query frames broadcast; no self-join " +
      "degrades to a Cartesian product") {
    Seq("q106_cluster_prune", "q113_ann_recall").foreach { q =>
      val p = plan(q)
      withClue(q) {
        p should include("Broadcast")
        p should not include "CartesianProduct"
      }
    }
  }

  test("q124/q130: the mining band filter sits below the top-k window; " +
      "the cell profile rides broadcast codebooks — no Cartesian products") {
    Seq("q124_hard_negatives", "q130_ivf_cell_profile").foreach { q =>
      val p = plan(q)
      withClue(q) {
        p should include("Broadcast")
        p should not include "CartesianProduct"
      }
    }
  }

  test("q125/q127/q128: the distribution audits carry no join of the " +
      "corpus against itself — aggregates and windows only") {
    // q127/q128 have no join at all; q125's plan is aggregate + window
    // over the vocabulary frame. None may contain a pair join.
    Seq("q125_zipf_audit", "q127_eval_roster", "q128_source_entropy")
      .foreach { q =>
        val p = plan(q)
        withClue(q) {
          p should not include "CartesianProduct"
          p should not include "SortMergeJoin"
        }
      }
  }

  test("q122/q129: novelty and banding audits ride hash-keyed " +
      "aggregates over the shared shingle features — never all-pairs") {
    Seq("q122_source_novelty", "q129_banding_recall").foreach { q =>
      val p = plan(q)
      withClue(q) { p should not include "CartesianProduct" }
    }
  }

  test("q133: the split repair rides the memoized CC label leaf and " +
      "id-keyed joins — no pair machinery, no Cartesian product") {
    // Warm the CC labels (q56 builds + memoizes the fixpoint).
    SparkEntry.queries("q56_dedup_clusters")(spark, SparkSpec.Sf0001).collect()
    val p = plan("q133_split_repair")
    p should not include "CartesianProduct"
    p should include("Scan ExistingRDD") // the lineage-cut label leaf
  }

  test("q135/q136: PQ encode is broadcast-codebook + hash argmin; ADC " +
      "is a broadcast LUT join — no Cartesian products, no window over " +
      "the corpus encode") {
    val enc = plan("q135_pq_codes")
    enc should include("BroadcastHashJoin") // S·K codebook
    enc should include("ObjectHashAggregate") // graft_argmin
    enc should not include "SortAggregate"
    enc should not include "Window"
    enc should not include "CartesianProduct"
    val adc = plan("q136_pq_adc_recall")
    adc should include("BroadcastHashJoin") // queries × S·K LUT
    adc should not include "CartesianProduct"
  }

  test("q134: per-key top-k aggregates hash-based — no Window, no " +
      "SortAggregate; the window form q07 is the contrast case") {
    val p = plan("q134_topk_agg")
    p should include("ObjectHashAggregate")
    p should not include "Window"
    p should not include "SortAggregate"
    plan("q07_window_topk") should include("Window")
  }

  test("q137: IVF-PQ rides broadcast centroid/codebook/LUT joins and " +
      "hash aggregates — no Cartesian product, no corpus-side sort agg") {
    val p = plan("q137_ivfpq_adc")
    p should include("BroadcastHashJoin")   // cell means, rcodebook, LUT
    p should include("ObjectHashAggregate") // graft_argmin encode
    p should not include "CartesianProduct"
  }

  test("q138/q139/q140: the deletion/exposure family rides the memoized " +
      "CC label leaf and id-keyed joins — no Cartesian product") {
    SparkEntry.queries("q56_dedup_clusters")(spark, SparkSpec.Sf0001).collect()
    Seq("q138_repetition_exposure", "q139_deletion_cascade",
        "q140_canonical_handoff").foreach { q =>
      val p = plan(q)
      withClue(q) {
        p should not include "CartesianProduct"
        p should include("Scan ExistingRDD") // the lineage-cut label leaf
      }
    }
  }

  test("q141: bigram LM is hash-keyed count joins into " +
      "TakeOrderedAndProject — no Window, no Cartesian product") {
    val p = plan("q141_bigram_lm")
    p should include("TakeOrderedAndProject")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q154: no Cartesian product; the corpus never joins itself — " +
      "the ECDF grid builds from the tiny stot × values frames") {
    val p = plan("q154_ks_drift")
    p should not include "CartesianProduct"
    // the deliberate grid cross join broadcasts (sources-sized build)
    p should include("BroadcastNestedLoopJoin")
  }

  test("q157: the quality and contamination legs READ memoized frames " +
      "(InMemoryRelation / cached leaf), never rebuild their stages") {
    val df = SparkEntry.queries("q157_datasheet")(spark, SparkSpec.Sf0001)
    val analyzed = df.queryExecution.optimizedPlan.toString
    analyzed should include("InMemoryRelation")
    plan("q157_datasheet") should not include "CartesianProduct"
  }

  test("q158: the sweep encodes via hash-aggregable argmin — no Window " +
      "over the corpus, no Cartesian product, codebooks broadcast") {
    val p = plan("q158_pq_budget_sweep")
    p should not include "Window"
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
    p should include("ObjectHashAggregate")
  }

  test("q159: one full-outer fingerprint join, no Cartesian product, " +
      "and the scan reads only the ledger columns") {
    val p = plan("q159_snapshot_delta")
    p should include("FullOuter")
    p should not include "CartesianProduct"
    val scans = SparkEntry.queries("q159_snapshot_delta")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan.collectLeaves()
      .filter(_.nodeName.contains("Scan"))
    scans should not be empty
    // text is fingerprinted in-flight; no scan carries wide unused cols
    all(scans.map(_.output.map(_.name).toSet)) should
      contain noneOf ("lang", "n_tokens")
  }

  test("q160: no pair is materialized — no self-join beyond the " +
      "memoized CC labels, aggregates all the way down") {
    val p = plan("q160_cluster_purity")
    p should not include "CartesianProduct"
    // the three single-row legs combine via broadcast nested loop
    p should include("BroadcastNestedLoopJoin")
  }

  test("q161: one scan, one Expand for the three count-distinct legs, " +
      "pruned read schema") {
    val df = SparkEntry.queries("q161_norm_lift")(spark, SparkSpec.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    p should include("Expand")
    p should not include "Join" // no pairs, no groups, ever
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    scan.output.map(_.name).toSet shouldBe Set("text", "source")
  }

  test("q162: the sweep crosses a broadcast threshold frame against " +
      "the bounded profile — no corpus-sized join on the sweep side") {
    val p = plan("q162_decontam_sweep")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // 4-row threshold frame
  }

  test("q163: the curve ranks the vocab-sized marginal, never the " +
      "corpus — the rank window sits above the term aggregate") {
    val df = SparkEntry.queries("q163_coverage_curve")(spark, SparkSpec.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // 4-row threshold frame
    // exactly one Window (the vocab rank), fed by aggregates
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.size shouldBe 1
  }

  test("q164: the rank leg is the two-phase sharded row_number — " +
      "bucket offsets broadcast back (no sort-merge join), every " +
      "window partitioned by (source, bucket), pruned scan") {
    val df = SparkEntry.queries("q164_token_gini")(spark, SparkSpec.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should include("Window")
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    scan.output.map(_.name).toSet shouldBe Set("doc_id", "text", "source")
  }

  test("q165: the plan derives from q159's aggregated frame — one " +
      "fingerprint join, then aggregates and projections only") {
    val p = plan("q165_rebuild_plan")
    p should include("FullOuter")
    p should not include "CartesianProduct"
    p should not include "Window"
  }

  test("q166: the sweep never re-runs the index per probe budget — " +
      "centroids broadcast, no Cartesian between data-sized frames") {
    val p = plan("q166_nprobe_sweep")
    p should not include "CartesianProduct"
    p should include("BroadcastNestedLoopJoin") // centroid/probe frames
    p should include("ObjectHashAggregate")     // the argmax assignment
  }

  test("q167: one conditional pivot over the decision frame — no join " +
      "added beyond q89's own plan, no Cartesian product") {
    val p = plan("q167_gate_calibration")
    p should not include "CartesianProduct"
    p should not include "Window" // buckets are CASE, not ranks
  }

  test("q168: judging joins ride broadcast label tables; no Cartesian " +
      "beyond the retrievers' own audited broadcast shapes") {
    val p = plan("q168_retrieval_eval")
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin") // the label judge joins
  }

  test("q169/q170: the classifier audits collapse the centroid fan-out " +
      "through hash-aggregable argmax/top-k — no window over the corpus, " +
      "codebook broadcast, no Cartesian degradation") {
    for (q <- Seq("q169_centroid_recovery", "q170_margin_audit")) {
      val p = plan(q)
      p should include("ObjectHashAggregate") // graft_argmax / graft_topk
      p should not include "Window"
      p should not include "CartesianProduct"
      p should include("Broadcast") // the k-row codebook side
    }
  }

  test("q173: the provenance slice keeps the audit family's shape — " +
      "hash-aggregable argmax, no window over the corpus, no Cartesian; " +
      "the documents side is a two-column pruned scan") {
    val p = plan("q173_source_recovery")
    p should include("ObjectHashAggregate") // graft_argmax worst-label
    p should not include "Window"
    p should not include "CartesianProduct"
    p should include("Broadcast") // the k-row codebook side
    val docsScan = SparkEntry.queries("q173_source_recovery")(
      spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan.collectLeaves()
      .filter(_.nodeName.contains("Scan"))
      .find(_.output.exists(_.name == "source")).get
    docsScan.output.map(_.name).toSet shouldBe Set("doc_id", "source")
  }

  test("q175/q178/q181: the noise family collapses the fan-out through " +
      "hash-aggregable argmax — no window over the corpus, thresholds " +
      "and codebook broadcast, no Cartesian degradation") {
    for (q <- Seq("q175_label_noise", "q178_noise_roster",
        "q181_noise_by_source")) {
      val p = freshTree(q)
      withClue(q) {
        treeHas(p, "ObjectHashAggregate") shouldBe true // graft_argmax
        treeCount(p, "Window") shouldBe 0
        treeHas(p, "CartesianProduct") shouldBe false
        treeHas(p, "Broadcast") shouldBe true // codebook + threshold sides
      }
    }
    // q178's global top-30 is a bounded heap merge, never a global sort
    plan("q178_noise_roster") should include("TakeOrderedAndProject")
  }

  test("q176: the EMD grid fuses the running sum and the lead gap into " +
      "ONE source-keyed Window node — q154's shape plus nothing") {
    val p = freshTree("q176_emd_drift")
    // exactly two Window nodes total: the corpus-domain ECDF and the
    // fused grid pass (a third would mean the lead split off its own
    // sort/shuffle)
    treeCount(p, "Window") shouldBe 2
    treeHas(p, "CartesianProduct") shouldBe false // grid crossJoins broadcast
  }

  /** Count physical nodes by name, stripping the tree-art prefix. */
  private def nodeCount(p: String, node: String): Int =
    p.linesIterator.count(
      _.replaceAll("^[\\s:+*-]+", "").startsWith(node + " "))

  test("q180: the run passes are shard-stitched — every corpus-side " +
      "window partitioned by (source, shard), edge/offset frames " +
      "broadcast back, no hazard window; text bytes never reach the " +
      "exchange") {
    val df = SparkEntry.queries("q180_crawl_runs")(spark, SparkSpec.Sf0001)
    val t = df.queryExecution.sparkPlan
    graft.tools.PlanCensus.hazardWindows(t) shouldBe empty
    val p = t.toString
    p should include("BroadcastHashJoin")
    // the scan is pruned to the narrow projection — the md5 happens
    // before the shuffle, text never crosses the wire
    val scan = t.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    scan.output.map(_.name).toSet shouldBe Set("source", "doc_id", "text")
  }

  test("q184: the CUSUM walk rides the grid, not the events — the " +
      "stacked window passes sit above the partial (type, hour) " +
      "aggregate, change hours are hash-aggregable argmax") {
    val p = plan("q184_cusum_shift")
    // cum + running min + running max over one type-keyed order: the
    // walk is Window work over the grid; argmax hours never add a
    // window (graft_argmax rides the final ObjectHashAggregate)
    nodeCount(p, "Window") should be <= 3
    p should include("ObjectHashAggregate")
    p should not include "CartesianProduct"
  }

  test("q182/q185: the EMD grid family keeps q176's shape — bounded " +
      "grid windows, no Cartesian, no window over raw rows") {
    for (q <- Seq("q182_confidence_drift", "q185_ingest_drift")) {
      val p = freshTree(q)
      withClue(q) {
        treeHas(p, "CartesianProduct") shouldBe false
        // the per-key cumsum+lead pass fuses (q176's pin): at most the
        // domain window + the grid window
        treeCount(p, "Window") should be <= 2
      }
    }
  }

  test("q174/q183: the panels are JOINS OF CACHED sources-sized parent " +
      "frames — every parent monitor reads its memoized output, no " +
      "corpus re-scan inside the panel") {
    for ((q, parents) <- Seq(
        "q174_drift_panel" -> 3, // q117 + q126 + q100
        "q183_trust_panel" -> 3  // q176 + q181 + q182
    )) {
      val df = SparkEntry.queries(q)(spark, SparkSpec.Sf0001)
      df.collect() // cache/stage shapes are AQE runtime decisions
      val p = df.queryExecution.executedPlan.toString
      // TableCacheQueryStage marks a LIVE cache read; one per parent
      // means the panel never re-runs a parent's aggregation pyramid
      withClue(q) {
        p.linesIterator.count(_.contains("TableCacheQueryStage")) should
          be >= parents
        p should not include "CartesianProduct"
      }
    }
  }

  test("q177: Good–Turing is two stacked partial-aggregable hash " +
      "aggregates — no window, no sort aggregate, nothing corpus-sized " +
      "shuffles twice") {
    val p = plan("q177_good_turing")
    p should not include "Window"
    p should not include "SortAggregate"
    p should not include "CartesianProduct"
    p should include("HashAggregate")
  }

  test("q179: the burstiness top-20 is a bounded heap merge over the " +
      "term aggregate — never a global sort or a window over the corpus") {
    val p = plan("q179_burstiness")
    p should include("TakeOrderedAndProject")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q186/q188: kappa and lift collapse through hash aggregates — " +
      "no window over the corpus, no Cartesian degradation, marginal " +
      "sides broadcast") {
    val kappa = freshTree("q186_source_kappa")
    treeHas(kappa, "ObjectHashAggregate") shouldBe true // assigned argmax
    treeCount(kappa, "Window") shouldBe 0
    treeHas(kappa, "CartesianProduct") shouldBe false
    val lift = plan("q188_label_lift")
    lift should include("BroadcastHashJoin") // ni/nj marginals broadcast
    lift should not include "Window"
    lift should not include "CartesianProduct"
  }

  test("q187: the threshold sweep fans out the BOUNDED confidence grid " +
      "(≤2001×2 cells), never corpus rows — broadcast non-equi join, " +
      "no Cartesian product") {
    val p = freshTree("q187_risk_coverage")
    treeHas(p, "BroadcastNestedLoopJoin") shouldBe true // grid × 5 thresholds
    treeHas(p, "CartesianProduct") shouldBe false
    treeCount(p, "Window") shouldBe 0
  }

  test("q189/q190: density and Simpson re-aggregate MEMOIZED frames — " +
      "no new corpus window, no Cartesian product, hash aggregation " +
      "only") {
    for (q <- Seq("q189_cluster_density", "q190_simpson")) {
      val p = plan(q)
      withClue(q) {
        p should not include "CartesianProduct"
        p should not include "Window"
        p should not include "SortAggregate"
      }
    }
  }

  test("q191/q192: the sequence pair rides ONE user-keyed sort each — " +
      "lead/gap/session windows stack on the q25 shuffle, cells " +
      "re-aggregate hash-side, marginals broadcast") {
    val trans = plan("q191_event_transitions")
    // one lead pass; the static plan prints it once more under the
    // marginal's subtree (the shuffle is exchange-reused at runtime)
    nodeCount(trans, "Window") should be <= 2
    trans should include("BroadcastHashJoin") // the |types| marginal
    trans should not include "CartesianProduct"
    val entry = plan("q192_entry_sessions")
    // gap lag + cumulative session id fuse into stacked Window nodes
    // over ONE user sort; the entry type is a CASE inside the
    // aggregate, never a third pass
    nodeCount(entry, "Window") should be <= 2
    entry should not include "CartesianProduct"
    entry should not include "SortAggregate" // argmax entry, not max(string)
    entry should include("ObjectHashAggregate")
  }

  test("q193/q196: the ANN-graph audits generate candidates through the " +
      "bucket equi-join — never a Cartesian product — and rank with ONE " +
      "query-keyed window; the scalar/total sides are the only " +
      "nested-loop joins") {
    for (q <- Seq("q193_hubness", "q196_twonn_id")) {
      val p = freshTree(q)
      withClue(q) {
        treeHas(p, "CartesianProduct") shouldBe false
        treeCount(p, "Window") shouldBe 1
      }
    }
  }

  test("q194: the hazard walk runs over the ≤span-days frame — one " +
      "user-keyed aggregate below, broadcast observation boundary, " +
      "bounded windows above") {
    val p = freshTree("q194_survival")
    treeHas(p, "CartesianProduct") shouldBe false
    treeHas(p, "BroadcastNestedLoopJoin") shouldBe true // 1-row boundary
    treeCount(p, "Window") should be <= 2 // reverse risk-set + cum hazard
  }

  test("q195: the stationary iterate is a bounded LOCAL result — the " +
      "kernel collapsed to ≤|types|² rows before the driver loop, and " +
      "the returned frame plans as a local scan") {
    val p = freshTree("q195_stationary")
    treeHas(p, "LocalTableScan") shouldBe true
    treeHas(p, "CartesianProduct") shouldBe false
    treeCount(p, "Window") shouldBe 0 // kernel work happened upstream
  }

  test("q197/q198: the text-order audits keep aggregation hash-side — " +
      "conditional entropy has NO window at all; the rank correlation " +
      "rides exactly its two source-keyed rank passes over a pruned scan") {
    val ce = freshTree("q197_cond_entropy")
    treeHas(ce, "CartesianProduct") shouldBe false
    treeCount(ce, "Window") shouldBe 0
    val rc = freshTree("q198_rank_corr")
    treeHas(rc, "CartesianProduct") shouldBe false
    // two sharded rank passes: every window partitioned by
    // (source, bucket) or riding the bounded offsets frame
    graft.tools.PlanCensus.hazardWindows(rc) shouldBe empty
    val scan = SparkEntry.queries("q198_rank_corr")(spark, SparkSpec.Sf0001)
      .queryExecution.sparkPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    // n_chars is never read: both measures derive from the text column
    scan.output.map(_.name).toSet shouldBe Set("source", "doc_id", "text")
  }

  test("q199: the autocorrelation grid is broadcast-built (q184's " +
      "densification) and laged with ONE type-keyed window; moments are " +
      "a |types|-row hash aggregate") {
    val p = freshTree("q199_seasonality")
    treeHas(p, "CartesianProduct") shouldBe false
    treeHas(p, "BroadcastNestedLoopJoin") shouldBe true // types × hours
    treeCount(p, "Window") shouldBe 1
  }

  test("q200/q201: the cadence pair rides ONE window each — all seven " +
      "period lags are offsets over one grid sort; moments are hash " +
      "aggregates") {
    val ps = freshTree("q200_period_scan")
    treeHas(ps, "CartesianProduct") shouldBe false
    treeHas(ps, "BroadcastNestedLoopJoin") shouldBe true // types × hours
    treeCount(ps, "Window") shouldBe 1
    val cv = freshTree("q201_cadence_cv")
    treeHas(cv, "CartesianProduct") shouldBe false
    treeCount(cv, "Window") shouldBe 1
  }

  test("q202: the lifecycle ledger is one user-keyed window over the " +
      "distinct (user, day) frame; the churn join is day-ledger-sized") {
    val p = freshTree("q202_growth_accounting")
    treeHas(p, "CartesianProduct") shouldBe false
    treeCount(p, "Window") shouldBe 1
  }

  test("q203: the funnel is PURE window work on the session partitioning " +
      "— no join of any kind touches the corpus") {
    val p = freshTree("q203_session_funnel")
    treeHas(p, "CartesianProduct") shouldBe false
    treeHas(p, "SortMergeJoin") shouldBe false
    treeHas(p, "ShuffledHashJoin") shouldBe false
    treeCount(p, "Window") should be <= 6 // gap/cum + ord + t1/t2/t3 chain
  }

  test("q204: reciprocity is an equi-join of the bounded n·k edge frame " +
      "— never a Cartesian; the cold build textually repeats the edge " +
      "window per reference, but at runtime all three references read " +
      "the ONE memoized knnEdges build (MutualKnnSpec pins the count)") {
    val p = freshTree("q204_mutual_knn")
    treeHas(p, "CartesianProduct") shouldBe false
    treeCount(p, "Window") should be <= 3 // edges referenced 3× cold
  }

  test("q205/q206/q207: the session trio rides the memoized sessionized " +
      "stage — no Cartesian anywhere; cold builds inline the stage per " +
      "reference, the build-once runtime is pinned in SeqSupportSpec") {
    val sup = freshTree("q205_seq_support")
    treeHas(sup, "CartesianProduct") shouldBe false
    val lat = freshTree("q206_conversion_latency")
    treeHas(lat, "CartesianProduct") shouldBe false
    // no join of any kind: anchors, rank, AND the population count are
    // all windows (stage 2 + t1/t3 + rank + count over the bounded frame)
    treeHas(lat, "BroadcastNestedLoopJoin") shouldBe false
    treeCount(lat, "Window") should be <= 6
    val dw = freshTree("q207_dwell_share")
    treeHas(dw, "CartesianProduct") shouldBe false
    treeHas(dw, "SortMergeJoin") shouldBe false
    // stage (≤3 nodes cold) + lead + |types|-row share-denominator window
    treeCount(dw, "Window") should be <= 5
  }

  test("q208: entry/exit are struct min/max INSIDE the per-session " +
      "aggregate (ObjectHashAggregate) — no extra window beyond the " +
      "memoized stage, no Cartesian, no join at all") {
    val p = freshTree("q208_entry_exit")
    treeHas(p, "CartesianProduct") shouldBe false
    treeHas(p, "SortMergeJoin") shouldBe false
    treeHas(p, "ObjectHashAggregate") shouldBe true
    treeCount(p, "Window") should be <= 3 // the cold stage only
  }

  test("q122: the first-owner aggregate rides HashAggregate over the " +
      "dictionary-encoded source rank — no SortAggregate anywhere " +
      "(min(string) demoted the corpus-scale aggregate in round 12), " +
      "and the rank table broadcasts") {
    val p = freshTree("q122_source_novelty")
    treeHas(p, "SortAggregate") shouldBe false
    treeHas(p, "HashAggregate") shouldBe true
    treeHas(p, "BroadcastHashJoin") shouldBe true // name->rank dimension
    treeHas(p, "CartesianProduct") shouldBe false
  }

  test("q210/q213/q214/q215: the round-13 additions keep their bounded " +
      "shapes — heap-bounded top-k, broadcast codebook self-joins, " +
      "hash-only aggregates, no Cartesian products") {
    val paths = freshTree("q210_session_paths")
    treeHas(paths, "TakeOrderedAndProject") shouldBe true // top-20 heap
    treeHas(paths, "CartesianProduct") shouldBe false
    Seq("q213_centroid_separation", "q214_cluster_health").foreach { q =>
      val p = freshTree(q)
      withClue(q) {
        treeHas(p, "CartesianProduct") shouldBe false
        // the labels-sized self-join must ride a broadcast, never a
        // shuffle of the (tiny) codebook
        treeHas(p, "Broadcast") shouldBe true
      }
    }
    val vg = freshTree("q215_vocab_growth")
    treeHas(vg, "SortAggregate") shouldBe false // min(long) stays hash
    treeHas(vg, "CartesianProduct") shouldBe false
  }

  test("q216/q217: cohort and decile tables aggregate hash-only with " +
      "no Cartesian degradation") {
    Seq("q216_weekly_cohorts", "q217_ltv_deciles").foreach { q =>
      val p = freshTree(q)
      withClue(q) {
        treeHas(p, "CartesianProduct") shouldBe false
        treeHas(p, "SortAggregate") shouldBe false
        treeHas(p, "HashAggregate") shouldBe true
      }
    }
  }

  test("q211/q212: the quantile cut windows run over the HISTOGRAM " +
      "aggregate, never the sessions frame (the x30/x14 100x hazard " +
      "measured and fixed in round 13)") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q211_return_latency", "q212_depth_by_entry").foreach { q =>
      val p = freshTree(q)
      withClue(q) {
        // the quantile-cut windows (cum / totals) must sit ABOVE an
        // aggregate — i.e. they rank the histogram, not raw sessions.
        // (The user-partitioned sessionize window below is inherent
        // and distributes on user_id.)
        val cutNames = Set("cum", "n_gaps", "n_sessions")
        val cumWindows = p.collect { case w: WindowExec => w }
          .filter(_.windowExpression.exists(e => cutNames(e.name)))
        cumWindows should not be empty
        cumWindows.foreach { w =>
          val hasAggBelow = w.collectFirst {
            case a: HashAggregateExec => a
            case a: ObjectHashAggregateExec => a
          }.isDefined
          withClue(s"window ${w.windowExpression.map(_.name)}: ") {
            hasAggBelow shouldBe true
          }
        }
        treeHas(p, "CartesianProduct") shouldBe false
      }
    }
  }

  test("q219/q220/q221/q222: third-wave additions stay hash-aggregated " +
      "and Cartesian-free; q219 is joinless scan-shaped") {
    val scan = freshTree("q219_secret_scan")
    treeHas(scan, "CartesianProduct") shouldBe false
    treeHas(scan, "SortMergeJoin") shouldBe false
    treeHas(scan, "BroadcastHashJoin") shouldBe false // no join at all
    Seq("q220_dup_trend", "q221_error_streaks",
        "q222_norm_margin_corr").foreach { q =>
      withClue(q) {
        treeHas(freshTree(q), "CartesianProduct") shouldBe false
      }
    }
  }

  test("WHOLE SURFACE: no query plans a CartesianProduct or a GROUPED " +
      "SortAggregate (a keyed SortAggregate sorts its whole input — the " +
      "q122-class hazard; global string-buffer folds like q62's are " +
      "sort-free and exempt)") {
    import org.apache.spark.sql.execution.aggregate.SortAggregateExec
    val offendersCart = scala.collection.mutable.ListBuffer.empty[String]
    val offendersSort = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = freshTree(name)
      if (p.collect { case n if n.nodeName.contains("CartesianProduct") => n }
          .nonEmpty) offendersCart += name
      if (p.collect { case n: SortAggregateExec
          if n.groupingExpressions.nonEmpty => n }.nonEmpty)
        offendersSort += name
    }
    withClue("CartesianProduct plans: ") { offendersCart shouldBe empty }
    withClue("grouped SortAggregate plans: ") { offendersSort shouldBe empty }
  }

  test("WHOLE SURFACE in production posture: no query plans a hazard " +
      "rank window (empty or low-cardinality partition key over an " +
      "unbounded input — the q211/q217 ×30 class); exact mode still " +
      "carries its documented q217/q220/q227 windows, proving the check " +
      "sees the class it exists for") {
    // Production posture: the at-scale swaps a 100 TB deployment runs.
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val s = spark.newSession()
      s.conf.set(Features.CacheModeConf, "off")
      s.conf.set(Features.QuantileModeConf, "approx")
      s.conf.set(Events.CadenceModeConf, "segmented")
      org.apache.spark.sql.SparkSession.setActiveSession(s)
      try {
        val hw = graft.tools.PlanCensus.hazardWindows(
          SparkEntry.queries(name)(s, coldDir).queryExecution.sparkPlan)
        if (hw.nonEmpty) offenders += s"$name: ${hw.mkString(";")}"
      } finally {
        Features.clear(s)
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
      }
    }
    withClue("hazard rank windows in production posture: ") {
      offenders shouldBe empty
    }
    // Negative control: the detector DOES flag the exact-mode decile
    // windows (q217 global, q220/q227 per-source) it was built to catch.
    val exactFlags = Seq("q217_ltv_deciles", "q220_dup_trend",
      "q227_quality_trend").flatMap { name =>
      graft.tools.PlanCensus.hazardWindows(freshTree(name))
    }
    exactFlags should not be empty
  }

  test("WHOLE SURFACE: no multi-distinct Expand over an unbounded input " +
      "(the q233 class — Spark's count(DISTINCT a), count(DISTINCT b) " +
      "rewrite replicates every fact row per distinct group), outside " +
      "the two adjudicated narrow-projection whitelist entries; " +
      "negative controls prove the detector sees the pre-fix shapes") {
    import org.apache.spark.sql.functions.{broadcast, col, count,
      countDistinct, lit, row_number}
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val whitelistFired = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val eh = graft.tools.PlanCensus.expandHazards(freshTree(name))
      if (eh.nonEmpty) {
        if (graft.tools.PlanCensus.NarrowExpandWhitelist(name))
          whitelistFired += name
        else offenders += s"$name: ${eh.mkString(";")}"
      }
    }
    withClue("multi-distinct Expand over unbounded input: ") {
      offenders shouldBe empty
    }
    // The whitelist entries are conscious adjudications of REAL
    // detections, not stale names: both must still plan the Expand.
    whitelistFired.toSet shouldBe
      graft.tools.PlanCensus.NarrowExpandWhitelist

    val s = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val li = s.read.parquet(s"$coldDir/lineitem.parquet")
      // Negative control 1: the pre-fix q233 shape — two DISTINCT
      // legs over the raw fact scan — IS flagged.
      val preFix = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("a"),
          countDistinct(col("l_partkey")).as("b"))
      graft.tools.PlanCensus.expandHazards(
        preFix.queryExecution.sparkPlan) should not be empty
      // Negative control 2: a grouping-sets rollup Expand (q11's
      // declared-semantics class) is NOT flagged.
      val rollup = li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
      graft.tools.PlanCensus.expandHazards(
        rollup.queryExecution.sparkPlan) shouldBe empty
      // Negative control 3 (the boundedBelow broadcast fix): a global
      // rank window over corpus.join(broadcast(1-row stats)) is a
      // HAZARD — the build-side aggregate must not whitewash the
      // streamed corpus (the q234/q241 false-negative shape).
      val stats = li.agg(count(lit(1)).as("n_total"))
      val washed = li.crossJoin(broadcast(stats))
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"))))
      graft.tools.PlanCensus.hazardWindows(
        washed.queryExecution.sparkPlan) should not be empty
      // ...while the same window over a genuine aggregate of the
      // corpus on the MAIN chain stays bounded (not flagged).
      val boundedWin = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n"))))
      graft.tools.PlanCensus.hazardWindows(
        boundedWin.queryExecution.sparkPlan) shouldBe empty
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("q230/q231: the RANGE window rides the daily aggregate (never " +
      "the orders scan) and the orphan audit plans four anti joins") {
    val t = freshTree("q230_trailing_revenue")
    val win = t.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    win should not be empty
    win.foreach { w =>
      w.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.isDefined shouldBe true
    }
    val o = freshTree("q231_fk_orphans")
    val anti = o.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftAnti" => j }
    anti.size shouldBe 4
  }

  /** sf0.001 alias dir carrying BOTH layouts: flat symlinks plus the
    * `_part` warehouse layouts [[graft.tools.ScaleData.generatePartitioned]]
    * writes — the date/source-partitioned posture the 100 TB claim
    * rests on. */
  private lazy val partDir: String =
    graft.tools.ScaleData.partitionedAlias(spark, SparkSpec.Sf0001)

  test("partitioned layout: q05's o_month bounds reach the orders scan " +
      "as PartitionFilters (file-listing pruning, not a row filter), " +
      "and the result is row-identical to the flat layout") {
    val s = spark.newSession()
    s.conf.set(Features.CacheModeConf, "off")
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val df = SparkEntry.queries("q05_local_supplier")(s, partDir)
      val scan = df.queryExecution.sparkPlan.collectLeaves()
        .map(_.toString)
        .find(t => t.contains("orders_part")).get
      scan should include("PartitionFilters")
      scan should include regex "PartitionFilters: \\[[^\\]]*o_month"
      scan should include regex "o_month[#0-9]* >= 1996-01-01"
      scan should include regex "o_month[#0-9]* < 1999-01-01"
      df.collect().map(_.toString).toSeq shouldBe
        SparkEntry.queries("q05_local_supplier")(spark, SparkSpec.Sf0001)
          .collect().map(_.toString).toSeq
    } finally {
      Features.clear(s)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("partitioned layout: q248's one-week day window prunes the " +
      "events_part scan to 7 day-directories; q249's drill leg carries " +
      "a DPP subquery (dynamicpruningexpression) — the top-3-day " +
      "broadcast prunes the second pass at the file listing; both " +
      "row-identical to flat") {
    val s = spark.newSession()
    s.conf.set(Features.CacheModeConf, "off")
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val win = SparkEntry.queries("q248_window_report")(s, partDir)
      val winScan = win.queryExecution.sparkPlan.collectLeaves()
        .map(_.toString).find(_.contains("events_part")).get
      winScan should include("PartitionFilters")
      winScan should include regex "day[#0-9]* >= 2024-01-08"
      win.collect().map(_.toString).toSeq shouldBe
        SparkEntry.queries("q248_window_report")(spark, SparkSpec.Sf0001)
          .collect().map(_.toString).toSeq

      val drill = SparkEntry.queries("q249_peak_day_drill")(s, partDir)
      val planStr = drill.queryExecution.executedPlan.toString
      planStr should include("dynamicpruningexpression")
      drill.collect().map(_.toString).toSeq shouldBe
        SparkEntry.queries("q249_peak_day_drill")(spark, SparkSpec.Sf0001)
          .collect().map(_.toString).toSeq

      // the DOCUMENT-side twin: q250's drill leg reads documents_part
      // and must carry the same DPP subquery on `source`
      val docDrill = SparkEntry.queries("q250_hot_source_drill")(s, partDir)
      val docPlan = docDrill.queryExecution.executedPlan.toString
      docPlan should include("documents_part")
      docPlan should include("dynamicpruningexpression")
      docDrill.collect().map(_.toString).toSeq shouldBe
        SparkEntry.queries("q250_hot_source_drill")(spark, SparkSpec.Sf0001)
          .collect().map(_.toString).toSeq
    } finally {
      Features.clear(s)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("q27: the classify projection runs inside whole-stage codegen") {
    // Execute first: under AQE the codegen stars only appear in the final
    // plan (isFinalPlan=true).
    val df = SparkEntry.queries("q27_classify_stub")(spark, SparkSpec.Sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("md5")).get
    line should include("*(") // the WholeStageCodegen span marker
  }
}
