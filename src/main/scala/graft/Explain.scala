package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates `EXPLAINS.md`: the formatted physical plans of the
  * headline queries, with the scale-relevant property each plan is
  * expected to exhibit. Run after plan-affecting changes:
  * `sbt "runMain graft.Explain /root/testdata/sf0.001 EXPLAINS.md"`.
  * (`PlanShapeSpec` pins the load-bearing properties in CI; this file is
  * the human-readable audit trail.)
  */
object Explain {

  /** (query, the property to check in its plan). Loop-driven queries
    * (q56/q60) are omitted — their per-round plan equals q35's join
    * shape. */
  private val Headline: Seq[(String, String)] = Seq(
    "q01_pricing_summary" -> "filter pushed to the parquet scan (PushedFilters), pruned ReadSchema, one partial-aggregable hash aggregate pair, whole-stage codegen end-to-end",
    "q02_revenue_by_nation" -> "eager-aggregation reassociation: revenue sums PER ORDER (keys=[l_orderkey]) BEFORE any join, so the fact table reaches the orders join 4x smaller and key-aligned with the aggregate's own shuffle (measured x21.8 -> x4.8 at the 100x relational sweep); the nation dimension stays a BroadcastHashJoin",
    "q04_priority_exists" -> "EXISTS planned as a broadcast left-semi join",
    "q10_no_bigorder_anti" -> "NOT EXISTS planned as a broadcast left-anti join",
    "q35_minhash_lsh" -> "signatures from ONE hash aggregate over the cached post-hash shingle features; candidates from a banded equi-self-join (SortMergeJoin on band+bh), never a Cartesian product",
    "q37_shingle_jaccard" -> "inverted-index candidate join keyed on int64 hashed shingles; exact array intersect only after the candidate filter",
    "q38_cosine_topk" -> "query set broadcast (BroadcastNestedLoopJoin over 8 rows); the candidate side streams from the cached feature table with no shuffle before the per-query top-k window",
    "q39_lsh_ann" -> "bucket equi-join with the broadcast query set - candidate generation is an index lookup, not a scan product",
    "q41_label_centroids" -> "64 positional sums in one hash aggregate (map-side combine), 10-row centroid table broadcast back",
    "q44_ivf_ann" -> "centroid codebook broadcast for cell assignment; the per-vector cell argmax is ONE ObjectHashAggregate (graft_argmax - no window, no SortAggregate, map-side combine before the shuffle); probe joins only its own cell",
    "q52_asof_join" -> "union + single per-user window pass - one shuffle, no inequality-join row explosion",
    "q58_scalar_quant" -> "one-pass min/max stats broadcast; quantize+error is a map-shaped projection feeding one hash aggregate",
    "q72_bloom_incremental" -> "graft_bloom_contains filters sit at SCAN position on the batch side (inside WholeStageCodegen, before any Exchange) - definite-miss rows never reach either corpus join",
    "q73_decontamination" -> "benchmark shingle postings broadcast (BroadcastHashJoin); the training side streams with no shuffle before its per-doc aggregate",
    "q77_semantic_dedup" -> "decision assembly joins the corpus against the memoized CC label table, which is a lineage-cut localCheckpoint LEAF (Scan ExistingRDD) - the fixpoint never reruns per query AND its embedded plan never gets re-walked by the driver; no Cartesian product anywhere",
    "q79_kmeans_step" -> "seed table broadcast; per-vector assignment is ONE ObjectHashAggregate (graft_argmax, map-side combine) - no window, no SortAggregate; centroid update is 64 positional sums in one hash aggregate",
    "q80_repetition" -> "one partial-aggregable count + count-distinct aggregate pair over exploded shingle OCCURRENCES (repeats are the signal, so this derives from the documents scan, not the distinct-per-doc feature cache) - no join anywhere in the plan",
    "q81_boilerplate" -> "gram document-frequency from one partial-aggregable groupBy over the cached shingle arrays; top-k planned as TakeOrderedAndProject (per-partition heaps, no global sort); doc-count denominator broadcast",
    "q82_source_overlap" -> "distinct (source, fp) pairs once, self-join on fp with per-key fan-out bounded by the source count (a 10^6-copy viral dup is still ONE row per source); size lookups broadcast",
    "q83_split_assign" -> "stateless per-row hash assignment (no shuffle to assign) feeding one partial-aggregable groupBy over <= 3 x n_sources cells - no join anywhere in the plan",
    "q84_source_funnel" -> "q78's shared per-doc flag stage, memoized as a lineage-cut leaf (Scan ExistingRDD), grouped by source instead of globally - the marginal cost of the per-source breakdown is ONE partial-aggregable groupBy",
    "q85_span_dedup" -> "8-word window hashes via shifted-slice zip (O(tokens), no split re-evaluation); ONE consumption of the (window, doc) aggregate - the cross-doc test is a count over the h partition (r17; the former groupBy+semi-join planned the ngram explode twice), so a boilerplate window shared by 10^6 docs stays a count, never a pair join",
    "q86_bm25" -> "query-term isin filter BELOW the tf aggregate (only matching postings survive the explode); df and corpus stats broadcast (3-row / 1-row builds); top-10 planned as TakeOrderedAndProject; only the winners join back for source metadata",
    "q87_lm_quality" -> "LM built by two partial-aggregable groupBys (per-lang totals broadcast, vocab-sized term counts as the probe side of one term-keyed join - input skew on hot terms is AQE-visible); per-doc aggregate on uniform doc_id; worst-15 planned as TakeOrderedAndProject",
    "q88_containment" -> "identical candidate machinery to q37 (df-capped inverted-index join, never all-pairs, never Cartesian); the asymmetric containment metric is a per-candidate scalar swap, so the quote/excerpt detector costs nothing beyond the Jaccard top-20 it complements",
    "q89_quality_gate" -> "repetition + length gates are stateless per-row array expressions at scan position (no explode, no groupBy, no shuffle on that side); the LM surprisal side joins term-keyed with per-lang totals broadcast; decision join 1:1 on uniform doc_id - the same scorer runs unchanged on streaming micro-batches (QualityStreams)",
    "q90_sketch_quantiles" -> "percentile_approx (bounded-memory quantile sketch) and the exact percentile anchor fuse into ONE partial-aggregable ObjectHashAggregate pair - no sort, no window, no per-group full-value buffer on the sketch side; the in-engine approx_ok assertion keeps the sketch honest and the oracle hash pins it TRUE",
    "q91_pmi_collocations" -> "pair generation is a doc_id-keyed equi-self-join over per-doc DISTINCT words (no Cartesian anywhere; per-doc fan-out bounded by vocabulary, top-K-by-tf cap is the corpus-scale knob); the (w1,w2) aggregate is partial-aggregable with the support filter pruning the tail; unigram lookups are vocab-sized joins, N broadcasts, top-20 is TakeOrderedAndProject",
    "q92_extended_funnel" -> "q78's memoized lineage-cut flag leaf (Scan ExistingRDD) plus ONE broadcast left join against the memoized quality-REJECT set (rejects are the small side by construction - broadcasting admits would ship the corpus); stage prefix composes by conjunction, one partial-aggregable aggregate, 6-row explode",
    "q93_trending" -> "both rank windows run over the PARTIAL-AGGREGATED hour x type frame (tiny at any corpus scale), so the sorts they imply never touch raw events; ranking is row_number with a name tie-break - rank() peer ties would make the movement column engine-ambiguous",
    "q94_temperature_mixing" -> "two source-cardinality aggregates (counts, then the micro-floored-pow normalizer - exact int64 sum, never an order-dependent sum(double)) broadcast back onto ONE stateless per-row admission scan; no shuffle of documents anywhere",
    "q95_source_quality" -> "one partial-aggregable groupBy over the q89 decision frame, which rides the memoized lmTable feature table (InMemoryRelation) - the triage report costs one aggregate over already-derived decisions",
    "q96_sketch_fidelity" -> "exact Jaccard verification ONLY on the banded candidate pairs (q35's own cost shape over the shared feature caches); the audit adds one join to the cached shingle arrays and a single-row aggregate - sketch drift surfaces as a mean-error jump, never a silent dedup-quality decay",
    "q97_integrity" -> "orphan detection as two LEFT ANTI joins on the uniform id key (co-located under key bucketing at scale), duplicate-key and dim-drift counts as partial-aggregable aggregates; the seven 1-row check frames combine by broadcast - a single-row relation contract report",
    "q98_simhash_fidelity" -> "q96's audit shape for the sign-LSH sketch: exact cosine verification ONLY on q36's banded hamming<=3 pairs (never all-pairs), one join to the cached shingle arrays, single-row aggregate; the 4 possible angle estimates are JVM-computed int64 literals shared with the oracle, so no libm cos() parity risk exists in either engine",
    "q99_heavy_hitters" -> "two-pass exact heavy hitters: pass 1 a Misra-Gries TypedImperativeAggregate (ObjectHashAggregate, <=k-1 counters per source cross the shuffle - never the vocabulary); pass 2 exact-counts ONLY the candidates, pruned by a broadcast join at scan position; the n/k capture guarantee makes the phi-filtered output order-independent, which is what lets a sketch query be hash-oracled at all",
    "q100_embedding_drift" -> "one vec_id-keyed join (co-located under key bucketing), one partial-aggregable 64-sum groupBy per source, the GLOBAL mean re-aggregated from the source sums (no second corpus scan), single-row global frame broadcast back; floor-mean components stay 1e4-scaled at any corpus size so the final int64 dots can never overflow (raw-sum dots would at ~1e10 rows)",
    "q101_source_kl" -> "per-(source, term) counts are the finest aggregate (one partial-aggregable shuffle); the corpus marginal re-aggregates THAT frame (vocabulary-sized, never a second corpus scan), the join back is vocab-vs-vocab keyed by term with hot-term postings visible to AQE skew split; per-source totals and the grand total broadcast - the corpus text shuffles exactly once",
    "q102_packing_audit" -> "q76's per-source prefix-sum window (shard-local by construction at 100 TB - sequence order within a shard is all packing needs) followed by ONE partial-aggregable groupBy to a sources-sized report; bins/waste/straddles are exact integer arithmetic, so the audit carries zero float-parity machinery",
    "q103_epoch_allocator" -> "one scan -> per-source partial-aggregable token sums (sources-sized), single-row total broadcast back - the allocator is free at any corpus size; targets are exact int64 floor division (milli weights keep 2*M*w under 2^63 even at 1e13 corpus tokens), the epochs ratio one correctly-rounded double division (an int64 1e6*target WOULD overflow at planetary scale)",
    "q104_chunking" -> "one scan + a per-row sequence/explode whose fan-out is n_tokens/stride (doc-length-bounded, uniform - no skew) and NO shuffle at all; the chunk md5 doubles as the downstream chunk-dedup key, and slices reference the single tokens array rather than copying text per chunk",
    "q105_semantic_decontam" -> "the eval side is broadcast (benchmarks are 1e3-1e5 vectors by nature) and candidates are pruned by the shared sign-LSH bucket key - the 100 TB training side streams through a broadcast hash join with NO shuffle, then one partial-aggregable per-vector aggregate; the embedding-level leak n-gram decontamination (q73) cannot see, over the SAME eval slice",
    "q106_cluster_prune" -> "training -> pruning composition: q79's Lloyd step re-derives the codebook (two broadcast cross-joins against K-row frames, map-side-combining argmax, K x 64 longs shuffled), then ONE row_number window per cluster ranks members by centroid cosine and prunes the prototypical quarter; at 100 TB the exact rank swaps for a per-cluster cos-quantile threshold (approx-percentile broadcast back, O(1) memory) - the rank form is kept because it is what the oracle can pin",
    "q107_dsir_weights" -> "DSIR two-pass shape: pass 1 trains the hashed-bigram log-ratio table over a FIXED 256-bucket domain (explode -> partial-aggregable groupBy, the vocabulary never crosses the shuffle; target counts left-join raw counts bucket-vs-bucket), pass 2 scores via broadcast join + per-doc sum - the corpus shuffles only on doc_id; at 100 TB pass 1 runs once over a sample and ships lr as a frozen artifact, making scoring a map-side-only pass",
    "q108_method_agreement" -> "every leg is the PRODUCTION pair generator (q35's verified pairs, q36's hamming<=3 pairs, q37's rare-shingle jaccard, q34's fingerprint groups) so all pair sets stay banding-/df-cap-bounded - never all-pairs; the union and four flag joins are pair-keyed over those bounded sets and the output is <=16 rows via one partial-aggregable groupBy; the content-equality self-join carries the same viral-group quadratic hazard saltedSelfPairs defends elsewhere (scaladoc'd group-size cap for real pipelines)",
    "q109_surprisal_mixing" -> "q87's xent side (vocab-keyed LM join, doc_id-keyed partial aggregate) followed by ONE global NTILE window over the DOC-COUNT frame (rows = documents, not tokens) - the q106 exact-rank-vs-scale trade again: production swaps the quintile cut for approx-quantile thresholds broadcast back (graded rates are insensitive to boundary jitter), the exact NTILE is kept because the oracle can pin it; admission is the stateless content-hash coin, and the report is one partial-aggregable 5-cell groupBy",
    "q110_dup_histogram" -> "rides the memoized CC labels (pairs-bounded, tiny next to the corpus): sizes are one partial-aggregable groupBy on the label table, singletons one anti join of the corpus against label ids (co-located under id bucketing) into a single-row count, bands are exact-integer CASE buckets - the corpus never enters the fixpoint loop and the report is <=6 rows",
    "q111_epoch_shuffle" -> "stateless per-row hash with a 4-element epoch explode at scan position + ONE partial-aggregable groupBy over epochs x shards cells - no sort, no window, no join at any size; the 100 TB 'global shuffle per epoch' is exactly this (shard, intra-shard hash order) assignment stamped as a partition column, never an actual sort",
    "q112_quality_agreement" -> "every leg is the production scorer (q31's rule CASE at scan position, qualityDecisions against the memoized frozen LM, NTILE over the decision table's own xent) - the audit measures exactly the verdicts that ship; cross-tab is one partial-aggregable groupBy over <=12 cells, and the NTILE window carries the q106/q109 exact-rank-vs-scale trade (quantile thresholds at 100 TB)",
    "q113_ann_recall" -> "both legs are the production queries (q38's exact broadcast-scan baseline, q39's bucket ANN); the overlap join and candidate count key on (q_id, vec_id) over <= k x queries rows and the report is queries-sized; at 100 TB the exact side runs on a query SAMPLE - which is exactly how ANN recall is monitored in practice - and the audit is the number that tunes lshBits (recall collapsing WITH candidates = buckets too fine; without = unlucky sign boundaries, multi-probe's case)",
    "q114_crossmodal_dedup" -> "the pair set is q35's banding-bounded verified dups (never all-pairs); two id-keyed joins touch the embedding table only at the paired ids (co-located under id bucketing) and one single-row aggregate follows - the corpus text never enters; missing vectors are COUNTED as unscored (q97's orphan class), never silently dropped, so the audit doubles as a referential-integrity canary for the dedup pair ids",
    "q115_gopher_rules" -> "three of four rules are stateless per-row array expressions at scan position; the repetition feature is ONE partial-aggregable (doc, token) count + per-doc max (uniform keys, the q80 shape) merged back by a doc_id-keyed join - no window, no explode surviving past the aggregate, output is corpus-rows",
    "q116_split_leakage" -> "pairs come from q35's banding-bounded verified generator (report-shaped at any corpus size, never all-pairs); the split stamp is TWO id-keyed joins of the pair table against the narrow (doc_id, split) projection - the split expression is stateless per-row, the same ONE definition the write path stamps - and the cross-tab is one partial-aggregable groupBy over <= 6 cells",
    "q117_source_psi" -> "ONE partial-aggregable groupBy over sources x 8 fixed buckets is the only corpus-sized operation; the corpus marginal re-aggregates THAT frame (8 rows), totals broadcast, and the fixed bucket domain is GENERATED per source (8 x sources rows) rather than shuffled - the PSI arithmetic runs over a frame whose size is independent of corpus scale",
    "q118_span_decontamination" -> "q73's broadcast-eval shape one window-length up: the eval slice's 8-word window hashes broadcast (BroadcastHashJoin), training windows stream through with NO shuffle before the per-doc aggregate; the window explode carries only 8-byte hashes (q85's argument), and totals join doc_id-keyed",
    "q119_contamination_triage" -> "both gates' per-doc hit frames are q73/q118's own plans (broadcast eval sides, no training shuffle); the triage adds two narrow doc_id-keyed left joins against the (doc_id, source) projection and ONE sources-sized partial-aggregable groupBy - the dashboard costs nothing beyond the gates it summarizes",
    "q120_dedup_savings" -> "rides the memoized CC labels (pairs-bounded, a lineage-cut leaf) via ONE broadcast left join onto the token scan - the token count is computed at scan position and the report is one sources-sized partial-aggregable groupBy; the marginal cost over q70's doc-count view is zero extra shuffles",
    "q121_chunk_dedup_rate" -> "chunksOf's stateless fan-out (no shuffle) feeds one partial-aggregable groupBy per (chunk_md5, doc); the cross-doc test is a count over the chunk_md5 partition and both per-doc totals fold into ONE aggregate (r17; the former semi-join form planned the chunk fan-out three times) - q85's count-only shape at chunk granularity, never a pair join",
    "q122_source_novelty" -> "distinct (source, h) over the memoized 8-byte hashed-shingle features is the only corpus-sized aggregate (partial-aggregable, uniform hash keys); first-owner attribution is a second partial-aggregable min(source) groupBy on the hash key - a shingle shared by 1e6 documents is ONE row per source here, so the viral-dup skew that salting defends in q35 structurally cannot arise, and the report join is sources-vs-sources",
    "q123_soft_dedup_weights" -> "rides the memoized CC labels (pairs-bounded lineage-cut leaf): cluster sizes are one partial-aggregable groupBy on the label table, the corpus takes ONE left join against the (id, size) projection, and per-doc floor(1e6/m) weights are exact int64 literals summed in one sources-sized groupBy - q60's decision-table shape with a weight column instead of a boolean",
    "q124_hard_negatives" -> "q38's exact plan with the band filter BELOW the window: the 8-row query set broadcast (BroadcastNestedLoopJoin), the candidate side streams from the cached feature table, and only rows inside [0.10, 0.30) reach the per-query row_number - the mid-band mass is a small fraction of the corpus, so the filter placement does the pruning the window cannot",
    "q125_zipf_audit" -> "the per-(source, token) count is the only corpus-sized aggregate (partial-aggregable, uniform keys); the rank window partitions by source over the VOCABULARY-sized count frame (never the corpus), only top-32 rows per source survive into the 4-sum OLS aggregate, and the slope is one double division of exact int64 sums - the fit itself is sources-sized at any corpus scale",
    "q126_label_psi" -> "q117's PSI shape on a categorical domain: the vec_id=doc_id join (co-located under id bucketing - BucketingSpec proves the exchange-free form) is the only corpus-sized operation, cells are ONE sources x 10-label partial-aggregable groupBy, the corpus marginal re-aggregates that frame, and the fixed label domain is GENERATED per source rather than shuffled",
    "q127_eval_roster" -> "one row_number window partitioned by source over a narrow (source, hash, id) projection - each partition is one feed's rows and only quota rows survive; no join anywhere in the plan, and the roster is sources x quota rows at any corpus size (the documented approx hash-threshold swap removes even the per-source sort at extreme cardinality)",
    "q128_source_entropy" -> "shares q101's per-(source, token) frame as the single corpus-sized aggregate; the entropy arithmetic is one ln per distinct count with exact int64 cell products, the normalization a floor division on an exact multiple - everything above the vocabulary frame is sources-sized, with no join in the plan at all",
    "q129_banding_recall" -> "the audit population is the df-capped rare-shingle candidate set (bounded, never all-pairs); signatures come from the memoized minhashSig table via two id-keyed joins, the band-hit test is 16 int64 equality comparisons at projection position, and the report is one <=3-row groupBy - the S-curve theory column is a JVM literal, so the plan carries no pow()",
    "q130_ivf_cell_profile" -> "rides the factored ivfAssigned pass (broadcast codebook + ObjectHashAggregate argmax - the identical plan q44 serves from); the profile adds ONE K-cell partial-aggregable groupBy, a generated domain left join for empty cells, and a single-row totals broadcast - the report is codebook-sized at any corpus scale",
    "q131_vocab_coverage" -> "the per-(source, token) count is the shared corpus-sized aggregate (q101/q128's frame); the corpus marginal and its top-K rank window run over the VOCABULARY-sized frame only, the K-row vocab broadcasts into a vocab-vs-vocab left join, and the report is one sources-sized groupBy - at 100 TB the vocab is a frozen shipped artifact and pass 1 disappears",
    "q132_span_severity" -> "q118's broadcast-eval shape with window POSITIONS kept (8 bytes more per window, still no training-side shuffle before the per-doc work); the gaps-and-islands row_number window partitions by doc_id over HIT rows only - flagged-docs-sized, not corpus-sized - and both aggregates above it are partial-aggregable over the same tiny set",
    "q133_split_repair" -> "rides the memoized CC label leaf (lineage-cut ExistingRDD); the repair is two id-keyed joins of the cluster-mass-sized label table against a narrow (doc_id, split) projection plus a broadcast-able canonical lookup, and the cross-tab is one <=9-cell partial-aggregable groupBy",
    "q134_topk_agg" -> "the rank-pruned top-k contrast to q07's window plan: ObjectHashAggregate with map-side combine collapses each customer to a <=3-element bounded heap BEFORE the shuffle (<=3*n_customers rows cross the wire), nothing sorts the input - q07's window form shuffles and sorts every fact row",
    "q135_pq_codes" -> "the PQ encode is one broadcast S*K-codebook join fanned into the hash-aggregable graft_argmin (ObjectHashAggregate, map-side combine - q44's assignment shape, never a window sort); the report groupBy is <=S*K cells, partial-aggregable; no corpus self-join anywhere",
    "q136_pq_adc_recall" -> "the LUT (queries x S*K exact partial d2) broadcasts by construction - per-query work against the codebook happens once, then the corpus scan reads 4-byte code rows through one broadcast join into a partial-aggregable per-(query, vector) sum; the exact leg is q38's broadcast shape (runs on a query sample at 100 TB)",
    "q137_ivfpq_adc" -> "the full IVF-PQ composition: 10-row floor-mean centroids broadcast into a stateless residual pass (vectors never shuffle), q135's broadcast-join + hash-argmin encode over residuals, and a cell-tagged broadcast LUT join so ADC scores only the probed cell's code rows; the full-corpus exact leg is the audit's reference and runs on a query sample at scale",
    "q138_repetition_exposure" -> "exposure = epochs x copies over the memoized CC label leaf and the broadcast source-count allocator frame; one doc_id-keyed left join + one per-source partial-aggregable groupBy are the only corpus-sized operations",
    "q139_deletion_cascade" -> "the blast radius is four independent bounded legs crossJoined as single-row broadcasts: cluster leg aggregates the memoized label table, chunk leg counts by closed form (no chunk-row explosion), vector leg is one id-keyed join, shard leg a <=epochs*shards distinct over the deleted slice only",
    "q140_canonical_handoff" -> "one partial-aggregable conditional-min/sum groupBy over the memoized cluster-mass-sized CC label table, then a filter - no corpus scan in the plan at all; output is handoff-sized",
    "q251_threshold_curve" -> "one pass over q40's intra-bucket candidate stream (NO threshold filter - the curve audits the filter decision) collapsed map-side into a <=41-cell cosine-band histogram; the reverse-cumulative admission counts are a window over those <=41 rows (q211's histogram-cumsum shape, never the pair stream). Prices every near-dup threshold at the cost of ONE enumeration - the knob the x400 sweep showed chooses the OUTPUT VOLUME, not an index",
    "q252_cell_blocked_neardup" -> "the scale-regime near-dup LISTER (the x400 finding's structural escape): candidates must share BOTH the q44 IVF cell (broadcast 10-row codebook, graft_argmax ObjectHashAggregate assignment - the data-adaptive prune) AND a wide sign band (disjoint-range keys, the data-oblivious prune only near-identical geometry survives at production 2x32-bit width); exact cosine verification runs ONLY on (cell, band, key) equi-join survivors - no all-pairs, no window, no sort, and in the near-identical regime (tau=0.95 off q251's curve) the verified output is LINEAR in corpus size",
    "q141_bigram_lm" -> "DEFAULT (broadcast LM mode): the frozen bigram+context count tables ship as one serialized artifact and graft_lm_xent2 scores every document AT SCAN POSITION - one doc scan into TakeOrderedAndProject, zero Generate, zero joins, zero corpus-bigram shuffle (the join form measured x9.85 at 100x docs; the expression form is bit-identical under the same oracle, and the shared artifact-size cap falls back to the join plan for an oversized bigram vocabulary). Join mode keeps the original shape: ONE bigram explode, vocabulary-sized count joins, worst-15 via TakeOrderedAndProject",
    "q142_banding_sweep" -> "identical bounded population to q129 (df-capped reference pairs, two id-keyed signature joins); the sweep adds a constant 5-struct explode per pair into a <=15-cell partial-aggregable groupBy - regrouping stored perms is free, and theory is JVM literals so neither plan carries pow()",
    "q143_weighted_sample" -> "one stateless keying pass over the narrow (doc_id, source, text-length) projection into TakeOrderedAndProject - per-partition k-heaps, k rows to the driver, no global sort, no shuffle wider than the k winners",
    "q144_rrf_fusion" -> "semantic leg is the audited q38 broadcast shape; lexical leg joins the per-(doc, term) tf aggregate against a <=3*queries broadcast term list (one uniform-key join + one partial-aggregable per-(query, doc) sum); both top-10s and the fused top-5 are bounded per-query windows and the fusion join is candidates-sized",
    "q145_scd2_intervals" -> "q25's shuffle-once posture: one user_id hash shuffle, per-user sorted windows for lag/row_number/lead, never a global sort except the presentation order; output is change-points-sized, strictly smaller than the log",
    "q146_dup_degree" -> "rides the memoized verified pair table (df-capped, bounded); degree is one union + one partial-aggregable groupBy of the pairs-sized frame into a <=4-cell report",
    "q147_state_attribution" -> "user-keyed equi join (both sides partition identically) with the interval containment as a post-join filter; per-user fan-out bounded by version count; <=6-cell partial-aggregable report",
    "q148_scd2_incremental" -> "delta-sized merge legs: ONE left join routes the stored artifact (pass-through/closed/seed by flag x is_current - r17; the former anti+semi pair planned the stored window chain three times), the seed||delta change chain windows over DELTA users only with the version offset riding a max window on the same user partitioning, and the fixture's two events passes exist only to fabricate the artifact boundary in-query (production reads yesterday's parquet dimension, scans only the delta)",
    "q158_pq_budget_sweep" -> "per M: the M*K-subvector codebook broadcasts and the encode is the stateless hash-aggregable argmin fan-out (q135's shape, ObjectHashAggregate, map-side combine) - no window over the corpus, no self-join; the sweep output is |Ms| rows and the production index stays memoized at M=4, untouched by the sweep",
    "q154_ks_drift" -> "per-(source, value) counts are the ONLY corpus-sized aggregate (q117's frame one key finer); the corpus marginal re-aggregates that frame; ECDF windows run over the |sources| x |values| grid (values = distinct-length domain, bounded by max doc length, not rows) with per-source partitions - the one global window orders the values-sized marginal only; ks_u is exact int64 div arithmetic, no float anywhere",
    "q155_event_debounce" -> "q25's shuffle-once shape: one user_id hash shuffle, per-(user, type) sorted lag window, never a global sort; the report is one partial-aggregable |types|-row groupBy with exact int64 div rates",
    "q156_touch_attribution" -> "everything windows per user (one hash shuffle); the converting-journey semi join keys on (user_id, journey) so both sides partition identically; per-journey ranks bound fan-out by the user's own event count; the report is one partial-aggregable <=|types|-row groupBy with exact integer linear credits",
    "q157_datasheet" -> "a COMPOSITION, not new machinery: the fingerprint leg is one partial-aggregable groupBy on the uniform fp key + one fp-keyed join (a viral dup is a count row, never a pair join); quality and contamination legs READ the session-memoized decision frames shared with q89/q92/q95/q119 (Scan ExistingRDD / InMemoryRelation in the plan); final joins are |sources|-vs-|sources|",
    "q149_event_pairs" -> "one partial-aggregable distinct on (user_id, type) is the only shuffle touching event volume; the pair self-join keys on uniform user_id with per-key fan-out bounded by the tiny type vocabulary (never quadratic in users or events); <=|types| reach totals BROADCAST onto the <=C(|types|,2)-row support table",
    "q150_rfm_segments" -> "one user_id shuffle for the per-user rollup; spend stays DECIMAL through the NTILE windows so ordering is exact in both engines; the three global quartile sorts are the oracle-pinned EXACT mode - spark.graft.quantiles.mode=approx swaps them for one percentile_approx row broadcast back (no global window at any user count); output <=64 rows",
    "q152_mad_outliers" -> "two broadcast joins (per-type median/MAD frames are |types| rows) around three aggregate passes; the outlier test compares pure int64s (dev_u*1000 > 3*mad_mu) so no boundary row can flip engines; exact per-type percentile kept because the oracle pins interpolated medians - percentile_approx is the documented 100 TB swap (q61's trade)",
    "q153_manifest_diff" -> "two manifestOf passes (in production the stored side READS the saved |sources|-row artifact instead of scanning) feeding a full outer join of two |sources|-row frames - change classification never compares corpora; the XOR equality test catches same-count in-place edits row counts cannot see",
    "q151_corpus_manifest" -> "ONE scan, every aggregate partial-aggregable (count/sum/min/max/bit_xor; the lang distinct is over a tiny domain), one shuffle keyed by source, |sources|-row output; the XOR checksum is commutative and carry-free so the manifest is partition-invariant and overflow-proof at any row count",
    "q159_snapshot_delta" -> "the delta is ONE full-outer join of two ~48-byte/doc fingerprint frames on doc_id (bucketed snapshots make it zero-shuffle) + one partial-aggregable groupBy to |sources|x4 rows; the corpus text is scanned once to fingerprint the live side and never shuffles - in production the stored side READS the shipped ledger artifact (ManifestWriter.writeLedger), so 'what changed' never compares corpus bytes",
    "q160_cluster_purity" -> "no pair is ever materialized: each Rand-decomposition leg is sum n*(n-1)/2 over a partial-aggregable group count (contingency cells / clusters / content groups) collapsing to three single-row aggregates cross-joined at the end; labels ride the memoized pairs-bounded CC table and the corpus contributes one narrow fingerprint scan - viral groups cost int64 multiplications, not joins",
    "q161_norm_lift" -> "three codegen'd hash columns in ONE narrow scan (text never shuffles), one groupBy carrying three count(DISTINCT) legs via a single partial-agg expand (3x fingerprint rows, still narrow), |sources|-row output; no pairs, no groups - distinct-key counts are all the lift numbers need",
    "q162_decontam_sweep" -> "the expensive per-doc overlap counts are the SAME memoized contamScores frame q73/q119 share (built once, FeatureBuildOnceSpec-pinned); the sweep collapses them to a (n_hits -> docs, chars) profile bounded by the distinct-overlap domain and crosses it with 4 broadcast threshold rows - adding a candidate threshold costs nothing at any corpus size",
    "q163_coverage_curve" -> "the corpus-sized work is the memoized sourceTokenCounts table (shared with q99/q101/q125/q128/q131); the curve re-aggregates it to the vocab-sized corpus marginal, ranks THAT frame (one vocab-sized window, never the corpus), and crosses 4 broadcast threshold rows - q162's sweep shape for the vocabulary family",
    "q164_token_gini" -> "one narrow (source, doc_id, n_tokens) projection; ranks run per source (one hash shuffle + per-source sort, q76's window class - no global sort), then one partial-aggregable groupBy to |sources| rows; exact int64 Gini/top-decile arithmetic, DECIMAL is the documented swap past ~10^6 docs/source",
    "q165_rebuild_plan" -> "everything derives from q159's |sources|x4 (source, status) frame - one conditional pivot + integer threshold compares; the only corpus-sized input is the fingerprint join q159 already prices, and in production THAT reads the shipped ledger artifact",
    "q166_nprobe_sweep" -> "ONE pass for the whole sweep: each query ranks the 10 cells once (|queries| x 10 broadcast rows) and recall at nprobe=p is the prefix predicate prank <= p - reachable IS returned because the true top-5 outrank every candidate in any probed subset (serving-equivalence spec-pinned vs a live ivfAnn run); cell sizes are one partial-aggregable groupBy; the brute-force truth leg is queries-sized by construction (q113's sample-audit posture)",
    "q167_gate_calibration" -> "one conditional pivot over the q89 decision frame (frozen-LM input session-memoized); CASE octave buckets, not log() - exact integer compares; <=6-row output, one partial-aggregable groupBy over decisions already made",
    "q168_retrieval_eval" -> "each leg IS the production retriever (queries-sized outputs; the exact leg is the evaluation's cost - q113's sample-audit posture); judging joins <=3*k*|queries| rows against a broadcast label table; all reciprocal ranks integer-floored before averaging so no float summation order exists; 3-row report with honest full-query-count denominators",
    "q170_margin_audit" -> "the 10-row centroid codebook broadcasts into the fan-out (BroadcastNestedLoopJoin over k rows); the per-vector top-2 collapses through the rank-pruned graft_topk bounded-heap aggregate (ObjectHashAggregate, map-side combine - 2 longs per vector cross the shuffle, NO window over the corpus fan-out); the per-label re-aggregate is labels-sized (q169/q171/q172 share this shape and are pinned in PlanShapeSpec)",
    "q173_source_recovery" -> "q169's broadcast-codebook assignment joined to a two-column documents projection on vec_id=doc_id - the ONLY corpus-sized operation (co-locatable under id bucketing, the q126 posture; BucketingSpec proves the exchange-free form); everything above the (source, label) frame is sources x labels rows, the per-source argmax an ObjectHashAggregate with map-side combine, output |sources|-sized",
    "q174_drift_panel" -> "a COMPOSITION (q157's discipline): the three parent drift monitors (q117 length PSI, q126 label PSI, q100 embedding drift) each produce their audited sources-sized frame, and the panel is two |sources|-row equi-joins plus codegen'd integer-threshold CASE columns - no new corpus-sized operation exists in the plan",
    "q175_label_noise" -> "q170's broadcast fan-out shape with a second labels-sized broadcast (the per-class threshold table) joined in BEFORE the per-vector collapse; the confident argmax is ONE ObjectHashAggregate (graft_argmax - no window, no SortAggregate, map-side combine), the joint re-aggregates <= labels^2 cells, and the three report legs join labels-sized frames - the corpus crosses the wire once, as k-long argmax buffers",
    "q176_emd_drift" -> "deliberately q154's grid (per-(source,value) partial-aggregable count, |sources| x |values| ECDF frame): the source-partitioned running sum AND the lead gap term plan into ONE Window node (same partition+order spec - no extra shuffle, no second sort), then one partial-aggregable groupBy to |sources| rows",
    "q180_crawl_runs" -> "one narrow (source, doc_id, md5) scan; the lag break-flag and the running break-sum are two stacked Window nodes over ONE shuffle + ONE per-source sort (the run-sum consumes the lag's output, so they can't fuse - but no Exchange or Sort sits between them); run lengths and the per-source report are two partial-aggregable hash aggregates - text bytes never shuffle, fingerprints do",
    "q184_cusum_shift" -> "the CUSUM walk runs over the |types| x |hours| dense grid (bounded by the time window, never the event count; the hour domain is sequence()-densified over the span and BROADCAST structurally): one partial-aggregable (type, hour) count, the cumulative walk and its running min/max as stacked Window passes over ONE type-keyed shuffle + sort, change-point hours via the hash-aggregable graft_argmax (no second window, no sort aggregate) - raw events reduce map-side before anything sequential happens",
    "q186_source_kappa" -> "rides the memoized assigned fan-out (ObjectHashAggregate argmax, built once per session); hash(source) BEFORE the cells aggregate satisfies every downstream grouping/join distribution (source prefixes each key), so the kappa computation is exchange-free past one repartition (r17); every stage partial-aggregable over <= |sources| x k^2 cells - no window over the corpus, no Cartesian product",
    "q187_risk_coverage" -> "the threshold sweep fans out the BOUNDED (confidence-bucket, correct) grid (<= 2001 x 2 cells by construction) against the broadcast 5-row threshold frame (BroadcastNestedLoopJoin) - corpus rows are counted once into the grid and never multiplied",
    "q188_label_lift" -> "one narrow embeddings-documents equi-join, one partial-aggregable cell count; the n_i/n_j marginals re-aggregate the cell frame and BROADCAST back (BroadcastHashJoin) - nothing corpus-sized crosses the wire twice",
    "q189_cluster_density" -> "both inputs are memoized pairs-bounded frames (CC labels + verified pairs); the audit is two hash aggregates and one cluster-keyed join on tiny frames - no corpus scan, no triangle enumeration",
    "q190_simpson" -> "ONE re-aggregate of the memoized (source, token) vocabulary frame (TableCacheQueryStage) - the corpus-sized token explode ran once at cache build; |sources| rows out",
    "q191_event_transitions" -> "one user-keyed lead Window (the sessionize sort), a partial-aggregable <= |types|^2 cell count, and the broadcast from-type marginal (BroadcastHashJoin) - the static plan prints the window under both consumers, the runtime reuses the exchange",
    "q192_entry_sessions" -> "the gap lag + cumulative session id stack on ONE user-keyed shuffle + sort; the per-session aggregate picks the entry type via graft_argmax (ObjectHashAggregate - a max(CASE) over strings would demote everything to SortAggregate), then a <= |types|-row re-aggregate",
    "q193_hubness" -> "candidate generation is q39's bucket equi-join (never all-pairs; bits grows with log n), the top-k rank ONE window keyed by the high-cardinality query id, the in-degree count and band histogram partial-aggregable hash aggregates; the never-cited zeros fold through a left join against the id projection and the vector-count scalar broadcasts - <= 6 band rows out",
    "q194_survival" -> "one user-keyed aggregate (q64's shuffle shape) collapses the corpus to |users| rows, the observation boundary is a broadcast 1-row frame, and the risk-set/cumulative-hazard windows run over the <= span-days day table - time-bounded, never data-bounded; pure int64 (Nelson-Aalen needs no ln)",
    "q195_stationary" -> "the corpus-sized work is exactly q191's (one user-keyed lead window + <= |types|^2 cells); the kernel is then a bounded collected artifact and the 24 synchronous integer matvec steps run driver-side (the q79 collected-codebook discipline) - the result plans as a LocalTableScan",
    "q196_twonn_id" -> "shares q193's bucket equi-join verbatim (the in-bucket 2-NN IS the served 2-NN); squared euclids are exact int64 from the cached norms, the top-2 the same query-keyed window, and the per-label estimator a |labels|-row hash aggregate - duplicates (d1=0) and sparse buckets are counted columns, never silent drops",
    "q197_cond_entropy" -> "one bigram explode (token-mass-sized, q141's shape) into a partial-aggregable (source, bigram) count; the context marginal re-aggregates the COUNT frame, never the corpus, and joins back vocab-vs-vocab - |sources| rows out, no window anywhere",
    "q198_rank_corr" -> "per-doc measures are pure array expressions over a three-column pruned scan (no explode); the two rank passes are source-keyed windows (the q125 exact-rank caveat: the documented approx-quantile swap applies past memory scale); the moment aggregate is |sources|-sized with DECIMAL(38) headroom",
    "q199_seasonality" -> "q184's dense grid (sequence()-densified hours BROADCAST against the type list, missing hours fold 0 so the lag-24 pairing is positional in TIME), one type-keyed lag window, and a |types|-row five-moment hash aggregate; r is one double expression floored to micro with a zero-variance guard",
    "q200_period_scan" -> "all seven lags are offsets over ONE grid window pass (one shuffle, one sort - each lag is just another frame column); the stack() unpivot multiplies the TIME-BOUNDED grid by |lags|, and the moment aggregate is partial-aggregable to |types|x|lags| rows",
    "q201_cadence_cv" -> "q22's gap recipe keyed by TYPE - the stated q106-class caveat: the exact oracle form concentrates each type's events in one sort partition (|types| is low-cardinality); the documented production swap segments by the table's native date partitions, dropping the bounded |days|x|types| boundary gaps; moments are int64, CV one double expression",
    "q202_growth_accounting" -> "ONE user-keyed shuffle produces the distinct (user, day) frame and its per-user lag classification; the daily ledger is a <= span-days aggregate and churn a self-join of that bounded ledger on day-1 - the corpus crosses the wire once",
    "q203_session_funnel" -> "PURE window work: q25's session id, the session ordinal, and the three strict-order step anchors are ALL windows rooted on the same user partitioning - no join of any kind touches the corpus (plan-pinned joinless), and the report re-aggregates three rows",
    "q204_mutual_knn" -> "reads the session-memoized knnEdges table (built once, shared with q193 - MutualKnnSpec pins the build count); reciprocity is a left-semi equi-join of the n*k edge frame against its own reversal on the composite key, both sides identically partitioned; |labels| rows out",
    "q205_seq_support" -> "the per-(session, type) first-ordinal frame re-aggregates the MEMOIZED sessionized stage (built once, shared with q203/q206/q207 - SeqSupportSpec pins the build count); the pair self-join is session-keyed and type-bounded (<=|types|^2 rows per session); supports partial-aggregate to <=|types|^2 report rows with the base side broadcast",
    "q206_conversion_latency" -> "two stacked per-session min(CASE) anchor windows over the memoized sessionized stage; the latency frame is CONVERSIONS-sized and both the nearest-rank quantile and the population count are windows over that bounded frame (no join of any kind, plan-pinned); 5 rows out",
    "q207_dwell_share" -> "one in-session lead over the memoized sessionized stage (the session sort is already paid - sessionize once, query many: at warehouse scale that stage is the materialized session table every product-analytics query reads); the per-type aggregate is <=|types| rows and the share denominator a window over THAT frame - a separate total aggregate would re-run the corpus lead pass",
    "q208_entry_exit" -> "one per-session aggregate over the memoized sessionized stage with entry/exit selected by hash-aggregable graft_argmax keyed +-ord (a min/max over (ord, type) structs is a DECLARATIVE aggregate and demotes the whole thing to SortAggregate - measured, then fixed); a <=|types|^2 re-aggregate on top",
    "q209_head_scorecard" -> "train/test split by vec_id parity off the cached feature table; the even-half codebook (labels-sized) broadcasts into the test fan-out; per-vector top-1/top-2 collapse through ONE ObjectHashAggregate (graft_argmax + bounded-heap topk, map-side combine - never a corpus window); the scorecard re-aggregate is labels-sized",
    "q210_session_paths" -> "two leads on ONE window pass over the memoized sessionized stage; per-(session, trigram) counts then the global trigram aggregate are two stacked partial-aggregable hash aggregates; top-20 is a bounded heap (TakeOrderedAndProject), never a global sort",
    "q213_centroid_separation" -> "corpus cost is the one shared centroid aggregate (partial-aggregable 64-sum); the pair frame is a labels-sized broadcast self-join (<=labels^2/2 rows) - no corpus join anywhere",
    "q214_cluster_health" -> "cohesion from one corpus pass with the centroid table broadcast (partial-aggregable mean); the rival scan is the labels^2 broadcast self-join with the nearest rival picked by hash-aggregable graft_argmax; labels-sized report",
    "q215_vocab_growth" -> "first-seen ranks are one partial-aggregable min(rank) hash aggregate over the exploded distinct tokens (int64 buffer); the per-source doc-rank window partitions by source (low-cardinality caveat documented); sources-sized report with the doc-count side broadcast",
    "q216_weekly_cohorts" -> "the (user, week) frame is one partial-aggregable distinct; first-week a second user-keyed aggregate reusing the same shuffle key; cohort sizes broadcast back; <=weeks^2 triangle rows",
    "q217_ltv_deciles" -> "per-user LTV is a partial-aggregable exact-decimal sum scaled to int64; the decile rank is a global window over the USERS-sized frame (bounded; q61 caveat documented); 10 rows out",
    "q211_return_latency" -> "session bounds one hash aggregate off the memoized sessionized stage; the quantile cut rides a (gap -> count) HISTOGRAM (partial-aggregable) and a cumulative window over DISTINCT gap values - a global row_number over the sessions frame measured x30 at 100x and was replaced (values provably identical: nearest-rank depends only on sorted values)",
    "q212_depth_by_entry" -> "per-session aggregate (graft_argmax entry + count) then an (entry, depth) histogram with per-type cumulative cuts - per-type row_number over the sessions frame measured x14 at 100x and was replaced",
    "q218_dup_quality_phi" -> "rides the session-memoized ccLabels (pairs-bounded) + the q89 decision frame; the membership probe is a left join against the labels-sized id set; sources-sized contingency with exact phi",
    "q219_secret_scan" -> "one scan-shaped pass (explode -> per-token exact predicates -> stacked partial-aggregable aggregates); sources-sized report",
    "q220_dup_trend" -> "per-source ingest-order deciles over the ranked doc frame; dup membership one left join against the memoized labels-sized id set; <=10*|sources| rows",
    "q221_error_streaks" -> "gaps-and-islands: two stacked windows on the SAME user partition key (one shuffle), per-island aggregate, <=max-run histogram",
    "q230_trailing_revenue" -> "the corpus never enters the window: one partial-aggregable daily aggregate, then a RANGE value-frame sum over the span-days frame (exact int64 units) - q08's running total is the row-frame contrast case",
    "q231_fk_orphans" -> "four LEFT ANTI joins each collapsing to one count - no orphan rows reach the driver; dimension sides broadcast-able",
    "q222_norm_margin_corr" -> "rides the session-memoized centroidMargins frame (shared with q170/q171/q172 - build-count pinned); two per-label rank windows over that bounded frame; labels-sized report",
    "q223_gap_tail_quantiles" -> "q201's type-partitioned gap lag (same documented segmented swap), then the (type, gap) HISTOGRAM with per-type cumulative cuts - the q211/q212 scale-safe exact-quantile shape, never a rank over the gaps frame",
    "q224_format_profile" -> "one scan-shaped partial-aggregable pass (per-row regexp counts); corpus profile a 1-row broadcast; chi-square a fixed 4-term expression over exact counts; sources-sized",
    "q225_cluster_span" -> "memoized ccLabels joined once against the (doc_id, source) projection; two stacked partial-aggregable aggregates; <=|sources|-row histogram",
    "q226_quant_impact" -> "quantizer stats one 1-row broadcast; the even-half codebook broadcasts into ONE test fan-out scoring full AND reconstructed vectors; both argmaxes collapse through one ObjectHashAggregate; labels-sized",
    "q227_quality_trend" -> "rides the q89 decision frame (memoized lmTable features); per-source rank window (low-cardinality caveat documented); <=10*|sources| rows",
    "q228_dup_distance" -> "one projection + partial-aggregable histogram over q35's banding-bounded pairs; buckets by exact binary-string bit length (a float log2 rounds ambiguously at powers of two); <=63 rows",
    "q229_entry_value" -> "per-session argmax entry + exact-decimal value sum in ONE aggregate over the memoized sessionized stage joined 1:1 to event values on the same key; <=|types| rows with the grand total a 1-row window",
    "q05_local_supplier" -> "fact-LAST join order written out: the date-filtered orders pre-join customer and project to (o_orderkey, c_nationkey) before the 4-column lineitem projection joins on its own key - the fact table crosses exactly ONE shuffle (measured x12.8 -> x6.1 at the 100x relational sweep); supplier/nation/region broadcast",
    "q232_returned_revenue" -> "q05's fact-last discipline: half-year orders pre-join customer into a 4-column frame, the returnflag-filtered lineitem projection joins once, nation broadcasts, top-20 is TakeOrderedAndProject",
    "q233_waiting_suppliers" -> "TPC-H Q21 WITHOUT the triple fact self-join: ONE per-order partial-aggregable aggregate computes distinct/late-distinct supplier counts and the sole-late survivor via max; blamed orders are orders-scale and the supplier/nation joins broadcast",
    "q234_idle_rich" -> "scalar balance stats broadcast (1-row hinted cross join), cross-multiplied decimal threshold compare (never a division), recency-filtered LEFT ANTI join on the customer key, nations-sized report",
    "q235_peak_concurrency" -> "interval-stabbing +1/-1 sweep consumed ONCE (r17; explode, not unionAll): day totals, the intra-day running-sum max, and start counts fold into the single post-window aggregate (max(off+run) = off+max(run)); the only global window is the bounded |days|-row offset cumsum - no single-task sort over events at any count; bit-identical to the naive global window",
    "q236_user_gini" -> "exact Gini from the activity-level HISTOGRAM: one (type,user) count aggregate collapses to <=|types|x|levels| rows and every window runs over that aggregated frame - tie blocks contribute f*c + f(f+1)/2 rank mass exactly, no per-user rank window",
    "q238_embedding_quality" -> "two label-keyed partial-aggregable aggregates over the memoized scaled frame with stats broadcast back; outlier tests are DECIMAL(38,0) cross-multiplied compares - no division, no overflow at 10^9 vectors",
    "q240_knn_homophily" -> "one broadcast label-lookup join onto the memoized n*k knnEdges frame (shared with q193/q204 - built once), then a |labels| aggregate; chance marginals broadcast in",
    "q237_prefix_families" -> "one stateless slice+hash projection (no shingle explosion), one head-keyed partial-aggregable groupBy with distinct counts, TakeOrderedAndProject top-20; sub-8-token docs filtered before the shuffle",
    "q239_price_qty_corr" -> "ONE partial-aggregable groupBy over the pruned 3-column scan computes all five decimal-exact Pearson moments; no join, no window - the formula runs on |flags| rows",
    "q241_order_aging" -> "as-of anchor is ONE scalar max broadcast back (1-row hinted cross join); one partial-aggregable groupBy over the status-filtered scan",
    "q242_share_drift" -> "orders joins customer on its own key (lineitem never enters), nation broadcasts; share and YoY-delta windows run over the |years|x|nations| AGGREGATED frame - census-whitelisted by construction",
    "q243_weekday_profile" -> "ONE partial-aggregable (type, dow) aggregate - <=7x|types| cells; peak-day rank and chi-square windows run over that bounded frame; dow from epoch days (engine-neutral Thursday anchor)",
    "q244_supplier_gini" -> "one fact aggregate keyed by supplier, nation broadcast; the value-ordered rank is the two-phase shardedRowNumber (every sort task bounded by one revenue bucket); DECIMAL(38,0) rank x revenue products",
    "q245_repeat_interval" -> "orders shuffle once keyed by customer (high-cardinality lag partitions - not the hazard class); day-gap quantiles ride the histogram-cumsum shape over the bounded (segment, gap) frame",
    "q246_reorder_rate" -> "ONE fact-scale aggregate on the uniform (custkey, partkey, brand) composite; part broadcast onto the pruned 2-column lineitem projection; |brands|-sized partial-aggregable rollup",
    "q247_perm_sweep" -> "all three perm counts read the ONE memoized signature table (prefix lanes are valid k-perm MinHashes); the per-k error rows EXPLODE out of a single pass over the pairs-bounded base (r17; the unionAll form planned the 4-join base once per k); 3 report rows - no re-shingling, no re-aggregation per k",
    "q11_rollup_flags" -> "grouping-sets rollup planned as ONE Expand whose x(levels) fan-out is the query's DECLARED semantics (spark_grouping_id - the census distinguishes it from the q233-class multi-distinct rewrite Expand) feeding a partial-aggregable hash aggregate",
    "q28_kv_sorted" -> "the reference's SH1+K1 semantics (shuffle + global key sort into the TSV sink) planned as a RangePartitioning exchange - sampled bounds, PARALLEL sort tasks - never a single-task sort; runs once per report at output scale",
    "q49_salted_agg" -> "two-stage salted aggregate: the hot key fans out over (key, salt) in a first partial-aggregable groupBy, the second collapses salts - the planted-skew defense the skew phase measures; no single reducer ever owns a hot key",
    "q63_funnel_daily" -> "interval pair join as ONE user-keyed equi-join (time window as a post-join filter; per-user counts bound the pair blow-up), then the day report rolls up through an Expand-free (day,click)->(day,user)->day aggregate ladder - the q233-class multi-distinct rewrite, every stage partial-aggregable and shrinking",
    "q248_window_report" -> "the one-week day bounds sit at scan position; on the date-PARTITIONED warehouse layout (variant section below) the SAME filter becomes PartitionFilters - the scan never lists out-of-window day directories; flat testdata derives day in the projection, one oracle covers both layouts",
    "q249_peak_day_drill" -> "find-then-drill: top-3 purchase days as a bounded aggregate broadcast back into the full-profile drill; on the partitioned layout (variant below) the drill scan carries a dynamicpruningexpression DPP subquery - the second pass lists 3 day directories instead of re-scanning the log; distinct users via the Expand-free (day,user) ladder",
    "q250_hot_source_drill" -> "q249's find-then-drill on the DOCUMENT corpus: q45's sources-sized dup-share report + top-3 heap ranks the hot sources, the drill reads documentsBySource - on the source-partitioned layout the 3-row broadcast becomes a DPP subquery listing three source directories; one distinct aggregate per leg (no multi-distinct Expand)")

  /** Queries WITHOUT an EXPLAINS section, each mapped to the Headline
    * query that OWNS its plan shape — the machine-checked form of the
    * inclusion policy above (`ExplainPolicySpec` fails the build when a
    * registered query is neither listed in [[Headline]] nor mapped
    * here, and when an owner is stale). An owner means: this query's
    * physical plan repeats the owner's audited topology (same
    * join/aggregate/window skeleton, often over the same memoized
    * frames) with only projection/filter deltas — re-printing it would
    * duplicate the owner's section. */
  private[graft] val ShapeOwners: Map[String, String] = Map(
    // q77's decision-assembly topology (memoized lineage-cut CC label
    // leaf LEFT-JOINed by the corpus) over q252's pair graph
    "q253_nearident_dedup" -> "q77_semantic_dedup",
    // single-scan filtered/projected aggregates (q01's skeleton)
    "q06_forecast_revenue" -> "q01_pricing_summary",
    "q09_segment_stats" -> "q01_pricing_summary",
    "q12_priority_case" -> "q01_pricing_summary",
    "q14_promo_share" -> "q01_pricing_summary",
    "q20_hourly_events" -> "q01_pricing_summary",
    "q21_user_pivot" -> "q01_pricing_summary",
    "q24_json_buckets" -> "q01_pricing_summary",
    "q29_class_analytics" -> "q01_pricing_summary",
    "q48_date_math" -> "q01_pricing_summary",
    "q62_profile" -> "q01_pricing_summary",
    // dimension-join + fact-aggregate (q02's skeleton)
    "q03_shipping_priority" -> "q02_revenue_by_nation",
    "q15_top_supplier" -> "q02_revenue_by_nation",
    "q16_supplier_cnt" -> "q02_revenue_by_nation",
    "q17_small_qty_rev" -> "q02_revenue_by_nation",
    "q18_large_orders" -> "q02_revenue_by_nation",
    "q64_retention" -> "q02_revenue_by_nation",
    // high-cardinality per-key window pass (q52's skeleton)
    "q07_window_topk" -> "q52_asof_join",
    "q08_running_total" -> "q52_asof_join",
    "q22_event_gaps" -> "q52_asof_join",
    "q23_first_event" -> "q52_asof_join",
    "q25_sessionize" -> "q52_asof_join",
    // stateless per-row expressions + partial-aggregable groupBy (q83/q115)
    "q26_manifest_sanitize" -> "q83_split_assign",
    "q27_classify_stub" -> "q83_split_assign",
    "q42_binary_meta" -> "q83_split_assign",
    "q43_media_profile" -> "q83_split_assign",
    "q55_det_sample" -> "q83_split_assign",
    "q30_token_stats" -> "q115_gopher_rules",
    "q31_quality" -> "q115_gopher_rules",
    "q32_lang_guess" -> "q115_gopher_rules",
    "q33_fingerprint" -> "q115_gopher_rules",
    "q67_normalize" -> "q115_gopher_rules",
    "q68_content_scan" -> "q115_gopher_rules",
    // uniform-hash-key dedup aggregates (q122/q80's stacked-agg shapes)
    "q34_content_dedup" -> "q122_source_novelty",
    "q45_exact_dedup" -> "q122_source_novelty",
    "q13_order_count_dist" -> "q80_repetition",
    "q177_good_turing" -> "q80_repetition",
    // banded candidate joins (q35's skeleton; q56/q60 per the policy text)
    "q36_simhash" -> "q35_minhash_lsh",
    "q19_band_join" -> "q35_minhash_lsh",
    "q53_range_join" -> "q35_minhash_lsh",
    "q56_dedup_clusters" -> "q35_minhash_lsh",
    "q60_dedup_decisions" -> "q35_minhash_lsh",
    // verified-candidate audits (q96's skeleton)
    "q54_edit_verify" -> "q96_sketch_fidelity",
    "q59_banded_edit" -> "q96_sketch_fidelity",
    // ANN probes (q38/q39/q44 own the three generator shapes)
    "q40_embedding_neardup" -> "q39_lsh_ann",
    "q66_ann_retrieval" -> "q44_ivf_ann",
    "q71_embedding_profile" -> "q58_scalar_quant",
    "q169_centroid_recovery" -> "q79_kmeans_step",
    // vocabulary / term-statistics family (q81/q86/q90 skeletons)
    "q46_bpe_tokens" -> "q81_boilerplate",
    "q50_vocab" -> "q81_boilerplate",
    "q51_vocab_approx" -> "q90_sketch_quantiles",
    "q61_length_quantiles" -> "q90_sketch_quantiles",
    "q57_tfidf_terms" -> "q86_bm25",
    "q47_set_ops" -> "q82_source_overlap",
    // rank windows over bounded aggregated frames (q93's skeleton)
    "q65_rate_anomaly" -> "q93_trending",
    // curation composites over memoized stages
    "q69_incremental_dedup" -> "q72_bloom_incremental",
    "q70_dedup_report" -> "q110_dup_histogram",
    "q74_term_redaction" -> "q73_decontamination",
    "q75_source_mixing" -> "q94_temperature_mixing",
    "q76_context_packing" -> "q102_packing_audit",
    "q78_curation_funnel" -> "q84_source_funnel",
    "q181_noise_by_source" -> "q95_source_quality",
    // label-noise / drift / roster family owners
    "q171_margin_calibration" -> "q170_margin_audit",
    "q172_relabel_roster" -> "q127_eval_roster",
    "q178_noise_roster" -> "q127_eval_roster",
    "q179_burstiness" -> "q81_boilerplate",
    "q182_confidence_drift" -> "q176_emd_drift",
    "q185_ingest_drift" -> "q176_emd_drift",
    "q183_trust_panel" -> "q174_drift_panel")

  private[graft] def headlineNames: Set[String] = Headline.map(_._1).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = if (args.length > 1) args(1) else "EXPLAINS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cores = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder
    sb.append("# EXPLAINS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Explain` at `$sfDir`. Each section notes the\n")
    sb.append("scale-relevant property the plan is expected to show; the\n")
    sb.append("load-bearing ones are also pinned by `PlanShapeSpec` in CI.\n\n")
    sb.append(s"Inclusion policy: ${Headline.size} of " +
      s"${SparkEntry.queries.size} queries appear here — every query\n")
    sb.append("that INTRODUCES a plan shape (a new join/aggregate/window\n")
    sb.append("topology, a custom expression at a load-bearing position, a\n")
    sb.append("broadcast/salting/pruning decision worth auditing). Queries\n")
    sb.append("omitted are compositional re-reads whose physical plans\n")
    sb.append("duplicate an included section's shape over the same memoized\n")
    sb.append("frames (e.g. the sweep/audit family re-aggregating a pinned\n")
    sb.append("pair table) or driver-loop rounds whose per-round plan equals\n")
    sb.append("an included single-step plan (q56/q60 ≙ q35's join shape;\n")
    sb.append("kmeansAuto rounds ≙ q79). Plan REGRESSIONS are guarded by\n")
    sb.append("`PlanShapeSpec` across the whole surface, not by this file.\n\n")
    sb.append("The policy is MACHINE-CHECKED: every registered query is\n")
    sb.append("either a section here or a row in the shape-owner table at\n")
    sb.append("the end of this file (`Explain.ShapeOwners`);\n")
    sb.append("`ExplainPolicySpec` fails the build on a query that is\n")
    sb.append("neither, on a stale owner, and on an owner that is not\n")
    sb.append("itself a section.\n")
    Headline.foreach { case (name, property) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // Elide giant binary literals (q72's serialized Bloom sketches print
      // as ~120 KB hex blobs at every filter site — unreadable and 1 MB+
      // of checked-in noise).
      val elided = "0x[0-9A-Fa-f]{200,}".r.replaceAllIn(plan,
        m => s"0x<${m.matched.length - 2}-hex-char sketch literal elided>")
      // Cap runaway sections: a query over a memoized frame (q77) drags
      // the cached subtree's ENTIRE build lineage into the formatted
      // plan (650 KB of fixpoint internals). The doc's job is the
      // top-of-plan shape; the operative properties are pinned
      // programmatically in PlanShapeSpec regardless.
      val MaxSection = 24 * 1024
      val capped =
        if (elided.length <= MaxSection) elided
        else elided.take(MaxSection) +
          s"\n… <truncated ${elided.length - MaxSection} chars of " +
          "cached-subtree lineage — plan properties are pinned in PlanShapeSpec>"
      sb.append(s"\n## $name\n\n**Expected:** $property\n\n```\n")
      sb.append(capped.trim)
      sb.append("\n```\n")
    }
    // Conf-gated plan VARIANTS: the same query under a non-default mode
    // whose plan difference IS the scale claim — rendered beside the
    // default so the swap is plan-visible, not just scaladoc'd.
    val Variants: Seq[(String, String, (String, String), String)] = Seq(
      ("q150_rfm_segments (quantiles.mode=approx)", "q150_rfm_segments",
        graft.operators.Features.QuantileModeConf -> "approx",
        "the exact-mode NTILE quartile windows (global sorts) are REPLACED " +
          "by one percentile_approx aggregate row broadcast back onto the " +
          "per-user rollup - no global Window/Sort over users anywhere in " +
          "the plan, which is the documented 100 TB posture"))
    Variants.foreach { case (title, name, (ck, cv), property) =>
      val prior = spark.conf.getOption(ck)
      spark.conf.set(ck, cv)
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan =
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        sb.append(s"\n## $title\n\n**Expected:** $property\n\n```\n")
        sb.append(plan.trim)
        sb.append("\n```\n")
      } finally prior match {
        case Some(v) => spark.conf.set(ck, v)
        case None => spark.conf.unset(ck)
      }
    }
    // LAYOUT variants: the same query over the date-partitioned
    // warehouse layout, where the plan difference IS the 100 TB claim
    // (PartitionFilters / a DPP subquery instead of full-log scans).
    val partAlias = graft.tools.ScaleData.partitionedAlias(spark, sfDir)
    val LayoutVariants: Seq[(String, String)] = Seq(
      "q05_local_supplier" -> ("the o_month year bounds appear as " +
        "PartitionFilters on the orders_part scan - only the bounded " +
        "day directories are LISTED, the 100 TB date-layout posture"),
      "q248_window_report" -> ("the one-week day window appears as " +
        "PartitionFilters on the events_part scan - 7 day directories " +
        "listed whatever the log size"),
      "q249_peak_day_drill" -> ("the drill scan carries " +
        "dynamicpruningexpression(day IN dynamicpruning#N) in its " +
        "PartitionFilters - the top-3-day broadcast prunes the second " +
        "pass at the FILE LISTING (DPP)"),
      "q250_hot_source_drill" -> ("the document drill scan reads " +
        "documents_part with dynamicpruningexpression(source IN " +
        "dynamicpruning#N) - three source directories listed, the " +
        "corpus never re-scanned"))
    LayoutVariants.foreach { case (name, property) =>
      val df = SparkEntry.queries(name)(spark, partAlias)
      val plan =
        df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name (partitioned layout)\n\n**Expected:** " +
        s"$property\n\n```\n")
      sb.append(plan.trim)
      sb.append("\n```\n")
    }
    // The machine-checked owner table (ExplainPolicySpec reconciles it
    // against the query registry and this file's sections).
    sb.append("\n## Shape-owner table — queries without a section\n\n")
    sb.append("| query | owns its plan shape |\n|---|---|\n")
    ShapeOwners.toSeq.sortBy(t => (t._2, t._1)).foreach { case (q, o) =>
      sb.append(s"| $q | $o |\n")
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    graft.operators.Features.clear(spark)
    spark.stop()
    println(s"wrote $outPath")
  }
}
