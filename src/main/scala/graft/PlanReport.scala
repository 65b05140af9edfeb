package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Writes PLANS.md: the formatted physical plans of representative queries,
  * as reviewable evidence of plan quality (pushdown, pruning, broadcast
  * choice, codegen spans, custom operators). Regenerate with
  * `sbt "runMain graft.PlanReport"`.
  */
object PlanReport {

  private val picks: Seq[(String, String)] = Seq(
    "q1_pricing_summary" ->
      "Filter pushed to the parquet scan (PushedFilters), 7-of-11 column ReadSchema, partial→final hash agg around one exchange, single WholeStageCodegen span per stage.",
    "q5_nation_revenue" ->
      "lineitem stays the probe side; all five dims broadcast (no fact shuffle before the agg); range-rewritten year predicate pushed down.",
    "meter_billing_daily" ->
      "Generator is one Range (no join); the single window sort on (meter_id, ts) feeds the LAG staging; two-level aggregation with map-side partials; dims broadcast; 1-row tariff broadcast.",
    "dedup_minhash_lsh" ->
      "Sketches computed map-side over the shingle-hash array (no explode/groupBy before the signatures); the only exchanges serve the band-bucket candidate self-join and scoring joins.",
    "sim_lsh_topk" ->
      "Bucket bits are narrow FixedPointDot projections; candidate join keyed on the bucket; rank window runs per query id only.",
    "w5_topk_per_key_native" ->
      "Custom TopKPerKeyExec pair: partial bounded-heap prune → key exchange → final merge (compare to window row_number, which shuffles and sorts every row).",
    "st_ingest_960k_readings" ->
      "The consumer CPU path: Range generation → JSON encode/decode → validation filter → key dedup; one exchange for the composite-key dropDuplicates.",
    "quality_suite_dims" ->
      "All three conditional-count checks on meters compile into ONE aggregate (a single scan/Range per table, not one per check); unique and referential keep their own shapes; six check types total.",
    "dedup_embedding_lsh" ->
      "Threshold-dedup without an all-pairs join: all 24 band-key bits come from ONE fused PlaneSignMask projection; qv rides through the (band, key) bucket self-join so the exact-cosine verify runs inside the join's codegen stage — no candidate-id exchange, the only distinct sees verified pairs.",
    "pack_sequences" ->
      "Two-level distributed prefix sum: per-chunk token totals (tiny frame) take the only global window; the per-row cumulative sum is partitioned by chunk — no global single-partition window over the corpus.",
    "scd2_asof_orders" ->
      "Versioned-dim as-of join: BroadcastHashJoin on the equi key (custkey) with the date range as a residual condition — the fact side never shuffles or sorts on a range key.",
    "w10_share_of_total" ->
      "Ratio-to-report without the single-task global window: per-key aggregate, then a 1-row broadcast joined back; every stage is a partial-aggregated ordinary shuffle.",
    "decontaminate" ->
      "Contamination check at corpus scale: the tiny benchmark shingle side BROADCASTS into the train-side explode (no corpus shuffle for the join); the only exchange serves the per-doc final aggregate.",
    "meter_billing_daily_typed" ->
      "The typed Dataset/Aggregator mart keeps the untyped plan's shuffle structure: ObjectHashAggregate partial→final pairs around key exchanges, dims still BroadcastHashJoin — the typed API changes codegen at the agg boundary, never the exchanges.",
    "mm_decode_stats" ->
      "Codec-backed decode is a partition-preserving MapPartitions (no shuffle until the per-modality aggregate); payload generation and parse fuse into one narrow stage.",
    "dedup_embedding_ivf" ->
      "Trained-IVF threshold dedup: each Lloyd iteration broadcasts the codebook as ONE row, assignment is a map-side fused multi-dot + array ranking (no exchange), the centroid update is a single 64-column sum agg with map-side partials; probe cells slice the ranked array, and verification runs inline in the cell join.",
    "dedup_clusters_star" ->
      "Large-star/small-star connected components: per round, each star operation is one groupBy (neighborhood min) + one join — no windows, no driver graph; converged star edges become the labels directly.",
    "chunk_documents" ->
      "Sliding-window chunking is scan → project → generate (explode) → project: zero exchanges; the per-chunk hash is computed inside the same codegen stage.",
    "merge_upsert_customers" ->
      "MERGE decomposed into all-broadcast CDC arms: delete = BroadcastHashJoin LeftAnti, update = BroadcastHashJoin LeftOuter, insert = union — the base scan feeds every arm without a single exchange on a join key (no SortMergeJoin anywhere).",
    "asof_next_error_tolerance" ->
      "Forward as-of with tolerance has NO join node: one exchange on user_id feeds a single window sort; the conditional min over the FOLLOWING frame and the tolerance filter run in the same stage.",
    "unpivot_metrics_long" ->
      "Wide-to-long is an Expand node placed AFTER the aggregate: the corpus passes one partial→final hash agg, then the 3× row expansion touches only |groups| rows.",
    "text_gopher_rules" ->
      "All five policy rules and the composite verdict compile into ONE project over the scan — no shuffle at all; the whole policy is a single WholeStageCodegen span.",
    "text_top_tokens" ->
      "Distributed word count: explode → partial count (map-side combine) → key exchange → final count; only the |vocab|-row ranked head crosses the final single-partition window.",
    "w15_hopping_windows" ->
      "Sliding windows via the native TimeWindow Expand: each row fans into size/slide = 4 windows map-side, then ONE partial→final hash agg — no self-join against a window table, no per-window rescan.",
    "ts_time_weighted_avg" ->
      "LOCF time-weighted average: one per-meter window sort for the lead() spans, then a map-side-combinable aggregate of exact mW·ms products; nothing global anywhere.",
    "skyline_pareto_frontier" ->
      "Skyline without a global sort: per-price groupBy, band-keyed RANGE-frame prefix max, and a ~41-row band summary as the only cross-partition frame — the definitional NOT EXISTS is the oracle, not the plan.",
    "graph_label_propagation" ->
      "Synchronous LPA round: adjacency⋈labels equi-join → (node,label) partial-combined count → per-NODE rank window (frame = distinct neighbor labels, degree-bounded) → left join back; lineage truncated per round so plan depth stays constant.",
    "sim_hard_negatives" ->
      "Contrastive negative mining: one broadcast-query BNLJ pass scores the corpus, the lazily-checkpointed scored frame feeds BOTH the positive max and the per-query negative ranking — one corpus pass, query-keyed windows only.",
    "j_salted_skew_join" ->
      "Manual skew salting: the tiny dim side explodes over the salt range and the fact routes to pmod(event_id, 8) — the join exchange hashes (skew_key, salt), so the hot key spreads across 8 tasks instead of landing on one.",
    "dedup_chunks_cross_doc" ->
      "Cross-doc span dedup without a global sort: chunking is scan → explode → hash in one codegen stage; the chunk-hash document frequency is a map-side-combined aggregate; the verdict join hashes on chunk_hash only.",
    "profile_table_orders" ->
      "Single-pass profiling: every metric lives in ONE aggregate over one scan; the three exact count-distincts appear as Expand inside the same two-phase aggregate, never as separate scans.",
    "dsir_importance" ->
      "DSIR importance weighting: the per-bucket weight table (≤512 rows) re-aggregates from the (doc,bucket) frame and BROADCASTS back — the corpus-sized side never joins anything its own size; the keep threshold is a second 1-row broadcast.",
    "graph_pagerank" ->
      "Fixed-iteration integer PageRank: 8 unrolled rounds, each one edge⋈rank equi-join + one map-side-combinable groupBy(dst) + a left join onto the node frame; constant plan depth, no driver-side convergence loop, all BIGINT (bit-stable under any partitioning).",
    "q7_volume_shipping" ->
      "Two independent dim chains: supplier→nation collapses to a broadcast BEFORE touching lineitem, customer→nation prunes orders first — the only corpus-sized exchange is lineitem⋈orders on the order key.",
    "text_bigram_typicality" ->
      "Bigram-LM scoring: the global bigram and left-marginal tables re-aggregate from the per-doc frame (map-side combinable, ≪ corpus) and join back on the bigram key; every probability is scaled-integer floor division.",
    "funnel_view_click_purchase" ->
      "Staged-min funnel decorrelation: all three stages key their aggregates and joins on user_id — one exchange key end to end, so the sequential pattern costs one real shuffle.",
    "curation_funnel" ->
      "Four sequential gates composed in ONE plan: the policy stage is pure projection, dedup is one md5-keyed window, decontamination broadcasts the bench shingles; stage counts are 1-row aggregates unioned at the end.",
    "source_drift_tv" ->
      "Drift monitor: after the single (source,bucket) corpus agg, everything is a ≤|sources|×512 broadcast grid — exact cross-multiplied integers, one division at the very end.",
    "search_bm25_topk" ->
      "Ranked retrieval: the broadcast term filter prunes postings before the tf aggregate; df/avgdl are tiny broadcast aggregates; the head is TakeOrderedAndProject — no global sort, no window.",
    "dedup_edit_distance" ->
      "Lossless q-gram count filter: candidates from one shingle-hash equi-join + count bound, plus the short-doc length-band equi-join with a q=1 char-count prune (no nested loop). Note the explicit round-robin Exchange before the verification joins: AQE's size-based coalescing would fold the ~2 MB id-pair frame to ONE partition and serialize the O(n²) levenshtein — the repartition re-states parallelism where the projection, not the data, is the cost.",
    "q21_suppliers_who_kept_orders_waiting" ->
      "The classic EXISTS/NOT-EXISTS self-decorrelation: lineitem joins F-orders once, the per-order supplier profile is a two-level agg on the order key, and both correlated predicates collapse to n_supp/n_late_supp comparisons — the fact is scanned once per role, nation broadcasts, the head is TakeOrderedAndProject.",
    "q2_min_cost_supplier" ->
      "Correlated scalar-MIN decorrelated as argmin-join-back: the region-scoped offer book is computed once, its per-part minimum re-aggregates from it (≪ fact) and joins back on (part, cost); dims broadcast, bounded top-k.",
    "q9_product_profit" ->
      "Star profit rollup: every join key is the fact's own FK (no re-shuffle between joins under AQE), dims are column-pruned before joining, only the fixed 25-row nation is hint-broadcast, and the profit metric is exact-integer so the final two-key agg is partial+final with no precision hazard.",
    "vecstore_probe_topk" ->
      "The on-disk ANN index driven end-to-end on TRAINED IVF cells (r8 re-layout): the index scan's PartitionFilters carries a dynamicpruning expression on the cell partition column (fed by the broadcast top-4-of-16-cells probe set ranked against the stored codebook), so only probed cell DIRECTORIES — 25% of the corpus — are listed/read; measured recall@5 0.605 vs the sign-LSH layout's 0.13 (VecStoreSpec). Ranking windows run per query id only.",
    "search_hybrid_rrf" ->
      "Hybrid RRF after the r7 fix: BOTH retrieval legs cut to top-K through TakeOrderedAndProject (distributed per-partition heads) BEFORE any rank window — the windows now see only the two K-row candidate lists, and no Window node anywhere reads a corpus-sized frame.",
    "dedup_span_remove" ->
      "Span removal: ONE corpus shuffle (the gram-hash keeper aggregate); island merge is a per-doc window; the cut itself is a map-side array filter against each doc's collected span list — reassembly never joins the corpus against itself.",
    "dedup_span_intradoc" ->
      "Intra-doc repetition removal: every exchange is doc-keyed — the (doc, gram) first-occurrence window and the island window share the doc_id partitioning; no corpus-wide key exists in the plan at all.",
    "emb_centroid_outliers" ->
      "Centroid outlier filter: one 64-column map-side-combinable aggregate builds the per-label centroids, which BROADCAST back for the map-side cosine — the corpus never shuffles.",
    "sample_consistent_hash" ->
      "Consistent-hash sampling: the per-source rate table is a tiny distinct-aggregate broadcast back; the keep decision is a pure map-side hash comparison — zero corpus-wide shuffle, verdicts independent of partitioning.",
    "dedup_semantic_keep" ->
      "SemDeDup: the banded LSH pair graph (≪ corpus — verified pairs only) feeds min-label propagation whose per-round frames are label-sized; the corpus appears once, in the final left join attaching verdicts.",
    "dedup_containment" ->
      "Asymmetric containment: A-side rarest-first prefix filter only (no length filter — the container may be any size), candidates from one hash equi-join, codegen'd sorted-merge verification.",
    "w14_mad_anomaly" ->
      "Median/MAD robust scoring: two per-meter aggregates joined back on meter_id — no window over the corpus; the score and flag evaluate in the final projection's codegen stage.",
    "j_market_basket_pairs" ->
      "Market basket: pair generation bounded per order key (≤21 pairs/order), the self-join co-partitioned on l_orderkey, support a map-side-combinable count on the pair key.",
    "meter_billing_daily_incremental" ->
      "Incremental mart maintenance: the day-2 rebuild aggregates ONLY the delta slice (staging filtered by date) and dynamic partition overwrite rewrites exactly one billing_date directory — the read-back plan scans both partitions as a plain pruned parquet scan.",
    "bpe_tokenize" ->
      "BPE learn+apply: ONE corpus-wide pass (the word-frequency agg); every unrolled round then folds over the vocab-sized frame with a 1-row broadcast merge rule — localCheckpoint truncates round lineage, so the plan shown is the final round's short chain, not rounds 1..K replayed.",
    "sim_pq_topk" ->
      "Product quantization: training, encoding and ADC scoring all read the codebook as a BROADCAST (BroadcastHashJoin on m / BroadcastNestedLoopJoin on the query tables) — the one corpus Exchange regroups 8 narrow code rows per vector; the exact rerank joins only the per-query-constant shortlist back to the vectors.",
    // graph_hits is deliberately NOT printed: 4 unrolled rounds × two
    // broadcast-max normalizations make the FORMATTED tree ~116K lines —
    // the shape statement (id-keyed equi-joins + broadcast 1-row maxes,
    // no corpus Window) lives in its Scaladoc and GraphTsSpec instead.
    "graph_bfs_hops" ->
      "Multi-source BFS: fixed-depth relaxation; each round's Exchange carries only the reached frontier (node, dist) pairs, never the corpus.",
    "sim_ivfpq_topk" ->
      "IVF-PQ: coarse Lloyd + residual sub-codebooks all arrive as broadcasts; ADC scoring joins codes to per-(query, cell) tables ON THE CELL ID, so un-probed cells never enter the join — the index's partition key is the join key.",
    "decontaminate_embeddings" ->
      "Embedding decontamination: identical bucket-join shape as dedup_embedding_lsh (the pair machinery is shared) with one extra map-side cross-set filter — no new corpus-scale exchange.",
    "graph_kcore" ->
      "k-core peel: each round is ONE sym-edges⋈alive equi-join + a map-side-combinable HAVING count — single-reference rounds (dead nodes provably cannot resurrect), so plan depth is linear in rounds; the final degree count joins the converged core on both edge endpoints.",
    "decontaminate_bloom" ->
      "Bloom decontamination: the bitmap build is one bit_or aggregate over the bench probes; the corpus side joins the ≤8192-row bitmap as a BROADCAST (never the bench shingle set), and only bloom-surviving (doc, shingle) pairs reach the exact-verify broadcast join.",
    "text_source_overlap" ->
      "Source overlap: the corpus collapses to distinct (source, token) in one exchange; the pair self-join is keyed on token with per-key fan-out bounded by |sources| — a stopword matches ≤|sources| rows per side, so no skew blowup; unions come from inclusion-exclusion, not a second join.",
    "src_csv_roundtrip" ->
      "Format hop: write is a narrow scan→sink; read-back carries the EXPLICIT schema (no inference job in the plan) and feeds one partial→final hash agg — the checksum (bit_xor of the text hash) evaluates map-side in the same codegen span.",
    "src_bucketed_colocated_join" ->
      "Bucketed co-located join: both scans report the bucket spec (SelectedBucketsCount: 8 of 8) as their output partitioning, so the SortMergeJoin's INPUTS carry no Exchange — the shuffle was paid once at write time; the only exchange in the plan feeds the final aggregate. The layout contract a 100 TB fact joined daily on one key is stored under.",
    "graph_link_prediction" ->
      "RA link prediction: wedge enumeration is one adjacency self-join on the CENTER key with hub centers (deg > cap) filtered out BEFORE the join — per-center fan-out ≤ cap²; known edges leave via a LeftAnti equi-join, the head is TakeOrderedAndProject.",
    "a_exact_median_banded" ->
      "Exact median without a per-group sort: the corpus passes ONE (group, value) count agg; band offsets come from a window over the ≤~60-band frame, and only the median band's values are ranked (window bounded by values-per-band) — the oracle's global row_number window never appears.",
    "text_pair_lift" ->
      "Co-occurrence lift: the vocabulary head is a TakeOrderedAndProject that BROADCASTS into the posting filter (BroadcastHashJoin), bounding the per-doc pair fan-out at K²; the only corpus-wide exchange is the final pair count with map-side partials.",
    "text_vocab_growth" ->
      "Vocabulary growth: ONE corpus min-aggregate attributes each gram's first document (no ordered scan anywhere); the cumulative window reads only the ≤N/16-row bucket histogram.",
    "search_index_probe" ->
      "On-disk inverted index probe: the scan's PartitionFilters binds to the term-bucket partition column with bucket ids that are arithmetic constants of the query (computed driver-side from the same md5-prefix hash) — only the probed bucket directories are listed; the AND evaluates on the pruned postings alone.",
    "search_maintained_probe" ->
      "The MAINTAINED index probe (r12): two pruned scans — the committed fold AND the live epoch each carry the same static tb-bucket PartitionFilters (the bucket key is arithmetic, so a fresh unfolded epoch prunes exactly like the generation; no brute leg exists on this surface) — unioned before the doc-keyed AND count.",
    "search_hybrid_maintained" ->
      "Hybrid retrieval from MAINTAINED state only (r12): the BM25 leg's scans carry tb-bucket PartitionFilters (postings + the reserved stats bucket), the ANN leg's index scan prunes to probed cell= directories, both legs are K-row TakeOrderedAndProject heads, and the RRF fusion joins two K-row lists — no corpus-text or raw-embedding scan exists anywhere in the plan.",
    "dedup_incremental_clusters" ->
      "Incremental dedup read path (r12): the registered query is the LABEL VIEW only — per-source label scans (≪ corpus; pair-touched docs), a last-wins max_by per node, one window for cluster sizes. The corpus text appears NOWHERE in this plan: pair discovery already happened, epoch by epoch, at landing time — that is the entire point of maintaining dedup state.",
    "dedup_soft_weights" ->
      "Soft dedup: the MinHash pair graph and label propagation run on pair-touched docs only (≪ corpus); sizes re-aggregate the label frame; the corpus appears exactly once — the final doc-keyed left join attaching weights.",
    "meter_peak_coincidence" ->
      "Peak coincidence: one staged pass feeds the (meter, hour) aggregate; the system rollup and the 1-row peak probe (TakeOrderedAndProject → broadcast) re-aggregate that frame — the readings are never rescanned, and no window is wider than a meter key.",
    "a_dod_compression" ->
      "Delta-of-delta audit: two LAG taps share ONE per-user window sort (a single exchange on user_id), the byte-width classification evaluates in the same codegen stage, and the bucket histogram is a map-side-combinable 4-group aggregate.",
    "meter_vee_estimates" ->
      "VEE workflow: the flagged staging frame is computed once and feeds BOTH the valid-slot profile aggregate and the substitution join (no second scan of the readings); the profile joins back on its own (meter, hour) key, the CASE edit is map-side, and the audit rollup is one partial→final agg on meter_id.",
    "meter_load_duration" ->
      "Load duration curve: the readings pay ONE map-side-combinable hourly aggregate; the global rank/cumulative windows run only on the collapsed hour frame (8,760 rows/year at ANY fleet size), and the total is a 1-row broadcast — the single-task sort the shape implies never touches corpus-sized data.",
    "q16_supplier_breadth" ->
      "TPC-H Q16 shape: the NOT-IN supplier list decorrelates to a BroadcastHashJoin LeftAnti BEFORE the distinct (excluded suppliers never enter the offer shuffle); part filters push to the scan; the two-phase distinct + count-distinct share one key exchange and the head is TakeOrderedAndProject.",
    "ts_cusum_changepoints" ->
      "CUSUM change-points without recursion: the zero-clamped recursion compiles to prefix-sum MINUS running-min — TWO stacked Window operators over ONE per-meter exchange+sort (the second consumes the first's order; no re-sort), plus one combinable aggregate for the reference mean. The sequential-looking monitor is a plain keyed-window plan.",
    "meter_loss_allocation" ->
      "Largest-remainder loss allocation: ranking and the balance sum both partition by (zone, hour) — state bounded by meters-per-feeder at any fleet size; the feeder rollup re-aggregates the (zone, hour, meter) frame (no readings rescan), and the final per-meter rollup is map-side combinable.",
    "quality_classifier_centroid" ->
      "In-engine trained classifier: the corpus pays ONE map-side-combinable class-sum aggregate (direction) and ONE projection scan against the broadcast 1-row weight frame; the exact-optimal-threshold scan runs on the per-distinct-projection count frame — within-band windows partition by the value-range band, the band-offset window's frame is <=4097 rows BY CONSTRUCTION, and the argmin is a distributed TakeOrderedAndProject. No corpus-sized single-task operator anywhere in a training loop.",
    "meter_weather_normalize" ->
      "Degree-day regression: one staged pass feeds the (meter, day) aggregate; the <=31-row hash-weather frame BROADCASTS into the daily join; the per-meter moment aggregate is map-side combinable and each coefficient is a single codegen'd integer division — a fleet-wide regression with no shuffle wider than the daily rollup.",
    "search_proximity" ->
      "Proximity (slop) retrieval: both term posting filters evaluate in the SAME projected scan of the positional postings; the +/-window predicate rides the doc_id equi-join as a post-join filter, so the join's build side is one term's postings (tiny) and per-doc work is bounded by in-doc term frequencies.",
    "meter_erase_rewrite" ->
      "Meter-bronze RTBF at the composite (chunk_date x mbucket) layout: the post-erase answer is a plain pruned scan, and the erase itself (run inside the query) reads with a STATIC PartitionFilter on the mbucket column — bucket ids are driver-side arithmetic constants of the request, so only |dates| x |affected buckets| directories are listed; the rewrite is dynamic partition overwrite of exactly those composite partitions (retention by date is a zero-read directory drop, the drop_chunks analogue).",
    "quality_classifier_probe" ->
      "Persisted-weights classifier apply: the plan is ONE corpus feature scan crossed with a BroadcastNestedLoopJoin against the 1-row parquet weights frame — no aggregate, no window, no training stage anywhere; per-row work is a 5-term integer dot product and a compare. The training cost lives offline in the build step (the sim_ivfpq_probe_topk amortization doctrine applied to curation).",
    "sketch_store_probe" ->
      "Mergeable-sketch cube probe: the estimate legs scan ONLY the stored per-day sketch frame (|days| rows) — hll_union_agg partial→final around one tiny exchange; the fact table appears solely in the exact-verification legs the oracle requires, as one distinct-aggregate pass. At 100 TB the left half of this plan is the whole dashboard query.",
    "hist_store_probe" ->
      "Histogram-cube quantile probe: merged store rows (domain-bounded, ≤ |domain|/W per scope) pay one SUM groupBy + one cumulative window PARTITIONED BY SCOPE; rank location is a filter, not a sort of the data. The exact side collapses facts to value counts first — the only window runs on the count frame, never corpus rows.",
    "spatial_pairs_within_radius" ->
      "Grid-bucketed spatial self-join: the 9× neighbor replication is a BroadcastNestedLoopJoin against the CONSTANT 9-row offset frame (map-side, no data exchange); the point-point candidate join is a HASH join keyed on (cell_x, cell_y) — the only data-sized exchanges are the two sides' cell shuffles; the exact d2 predicate evaluates post-join in the same codegen stage. No CartesianProduct at any size.",
    "spatial_cluster_dbscan" ->
      "DBSCAN: degree count and core filter are one partial→final agg over the pair frame (≪ points); component rounds run on core edges only (min-label + pointer jump, lineage truncated per round); border assignment is one anti-join + one equi-join + a MIN agg. The corpus-sized frames appear only in the initial bucketed pair join.",
    "privacy_dp_counts" ->
      "DP histogram release MECHANICS (not a private release as shipped): the noise here is a DETERMINISTIC keyed draw — bit_count of the md5 hash of the published cell key — a harness device so the oracle can replicate it; being a public function of the key it is exactly invertible and carries zero actual privacy. The (1.25,1e-5)-DP analysis applies to the mechanism's algebra (Binomial(60,1/2)−30 noise, Δ=1, parallel composition over cells) once the draw is replaced by a secret RNG at deployment. Plan shape: ONE map-side-combinable (day, type) count; the noise is a codegen'd bit_count over the md5-prefix hash of the cell key, evaluated in the same projection — no second scan, no join, no window.",
    "hh_store_probe" ->
      "Heavy-hitter cube probe: estimate and slack legs read ONLY the |days|×(K+1)-row store against the broadcast 10-key frame (two broadcast joins + tiny aggs); the fact side pays one count aggregate for the exact verification the oracle requires. The store build (amortized, outside this plan) ranks per-day keys through TopKPerKeyExec's map-side bounded heap.",
    "survival_nelson_aalen" ->
      "Nelson-Aalen hazard: the next-purchase lookup is ONE per-user window (bounded by per-user activity); everything after runs on the duration-grouped frame (≤ span-hours rows) — exclusive-cumsum risk sets and the final cumulative hazard both carry the pmod(…,1) bounded-window key; the subject total is a 1-row broadcast.",
    "hh_store_maintained_probe" ->
      "The stream-maintained heavy-hitter cube probed after CubeLog compaction+finalization: the plan is IDENTICAL in shape to hh_store_probe — estimate and slack legs read only the folded |days|×(K+1)-row store (explicit-path scan of the committed generation, no batch_id partition column anywhere) against the broadcast 10-key frame; the summaries() fold's TopKPerKey/window legs collapse to empty-side unions because every day is finalized. Land→guard→fold→probe, one oracle hash.",
    "meter_billing_late_refresh" ->
      "Late-data invalidation read-back: the answer is a plain pruned scan of the mart directory — the invalidation work (DERIVED closure: each late row's own day + its successor-reading's day found by lead() over the late meters' bounded tail, staging over the invalidated days, dynamic partition overwrite of exactly the stale days) ran inside the query; nothing in the final plan rescans readings. The oracle is the FULL recompute, so this scan hash-matching it IS the invalidation-correctness proof.",
    "vecstore_scaled_probe" ->
      "The sqrt(n)-sized index driven at its DERIVED k: same dynamic-partition-pruned cell probe as vecstore_probe_topk, plus the exact brute-force truth leg (broadcast 2%-query-set BNLJ) and two 1-row verdict aggregates joined by a broadcast-hinted 1-row BNLJ (no CartesianProduct — PlanGuardSpec sweeps for exactly that) — the verification side the bounded-assertion oracle requires; the probe side alone is what production pays.",
    "vecstore_maintained_probe" ->
      "The MAINTAINED index probed after its retraining compaction folded every epoch: plan shape is identical to vecstore_probe_topk — broadcast codebook ranking, cell equi-join binding to the generation directory's partition column (dynamic pruning lists only probed cell dirs), no delta leg in the plan because the committed store has no live batches. The maintenance loop's work (epoch landings, Lloyd retrain at the derived k, commit) happened before this plan; hash-equality with the batch-built probe's oracle is the loop's proof.",
    "vecstore_live_delta_probe" ->
      "The maintained index probed MID-STREAM: the plan unions the two legs — the committed generation's cell equi-join (dynamic pruning lists only probed cell directories) and the live delta's broadcast BNLJ (every delta vector scored against the broadcast query set, cell-UNpruned by design: the delta is compaction-cadence-bounded and the brute leg is exact, so fresh vectors are retrievable with no recall penalty). One rank window over the union; n_cands records both legs' candidate volume per query.",
    "meter_forecast_conformal" ->
      "Split conformal: one staging pass feeds both splits (localCheckpoint); the calibration rank window partitions by meter (≤ cal-days×96 rows per partition); qhat joins back as a 1-row-per-meter frame; coverage is one combinable conditional aggregate. No global sort, no corpus-sized window.",
    "search_hybrid_multiquery" ->
      "The serving-shape hybrid, generalized to a QUERY-SET FRAME in r14 (PostingLog.hybridTopKSet — queries as a DataFrame of (query_id, terms, embedding)): ONE pruned posting scan (static tb PartitionFilters over the union of the batch's term buckets) fans out to its queries through a broadcast (query_id, term) join — |queries| rankings, one index read; the ANN leg's single cell-pruned probe ranks per query natively; RRF fuses two K-row-per-query lists with every window partitioned by query_id. Adding a query adds broadcast rows, never a scan.",
    "corpus_erase_everywhere" ->
      "The post-erase hybrid probe over the orchestrated-RTBF stores (r13): identical shape to search_hybrid_maintained — tb-pruned BM25 leg, cell-pruned ANN leg, K-row RRF fusion — with the five per-surface audit receipts attached as literal columns (zero plan cost). The five-store erase itself (bounded rewrites + grace purge on every surface) ran inside the query before this plan; the survivor-filtered oracle hashing equal IS the proof one deletion request cleaned bronze, postings, dedup state, and both vector indexes.",
    "search_expire_probe" ->
      "Calendar retention on the posting index (r13): the post-expiry probe is the ordinary pruned boolean-AND — static tb PartitionFilters under the chunk_date layout, fold ∪ live unioned. The expiry itself was a driver-side date-directory drop (zero rows read, per-date stats rows gone WITH their chunk); the retained-corpus oracle hashing equal proves the drop removed exactly the expired day from both legs.",
    "vecstore_expire_probe" ->
      "Calendar retention on the ANN index (r14): the post-expiry probe is the ordinary maintained probe — cell-pruned base leg (cell stays the OUTER partition under the chunked cell=K/chunk_date=D layout, so pruning is unchanged) ∪ brute live-delta leg. The expiry was bounded directory drops on the generation's cell tree and the live epoch (codebook untouched); the survivor-filtered live-delta oracle hashing equal proves expired embeddings rank in neither leg.",
    "ivfpq_expire_probe" ->
      "Calendar retention on the compressed index (r14): the post-expiry probe is the ordinary ADC path — codes joined ON the cell id under the chunked codes/cell=K/chunk_date=D layout, shortlist, exact rerank against the vectors tree. Expiry dropped (cell, date) composites on BOTH generation trees driver-side; the full-corpus-trained survivor-filtered oracle hashing equal proves expired codes score in no shortlist and expired vectors rerank nowhere.",
    "corpus_expire_everywhere" ->
      "ONE retention cutoff orchestrated across all five surfaces (r14, the retention twin of corpus_erase_everywhere): the post-expiry plan is the same two-tower hybrid probe (tb-pruned BM25 leg over per-date stats that decremented by construction, cell-pruned ANN leg) with the five RETAINED-row counts as literal receipt columns — r15 adds the fsck-clean bit (fsck_errors, also a literal: the VERIFIED drive ran checkCorpus + every per-store fsck before this plan and folded the counts into the receipt). The expiry itself was driver-side directory drops on every surface (dedup labels repaired for components that lost expired members); the survivor-corpus oracle re-deriving both towers AND every receipt count proves one cutoff aged the whole corpus out coherently.",
    "vecstore_probe_multiquery" ->
      "Serving-shape ANN on the pure top-k path (r15 — the hybridTopKSet doctrine without the lexical tower): the query set is a FRAME (vec_id % 23 — a panel disjoint from every other probe's), ranked against the broadcast packed codebook in one projection, explode(slice(ranked, …)) fans each query to its probed cells, and ONE cell equi-join against the maintained generation binds to the partition column — dynamic partition pruning lists only the probed cell directories regardless of |queries|. One rank window partitioned by query_id. Adding a query adds broadcast rows and probe keys, never a second pass over the index.")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of representative queries\n\n")
    sb.append("Generated by `graft.PlanReport` at sf0.001 (plan shapes are scale-independent;\n")
    sb.append("AQE may re-plan exchanges at runtime). What to look for is noted per query.\n")
    picks.foreach { case (name, note) =>
      // the bucketed-join evidence is the SMJ consuming the bucket layout;
      // at sf0.001 the dim fits the auto-broadcast threshold and would
      // mask it (at real scale neither side broadcasts), so print this
      // one query under the threshold a 100 TB join actually runs with
      val bcastOff = name == "src_bucketed_colocated_join"
      // save/restore the CONFIGURED value (not a hardcoded default) so a
      // non-default session setting survives for the remaining plans
      val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (bcastOff) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try {
          val df = SparkEntry.queries(name)(spark, d)
          df.queryExecution.explainString(FormattedMode)
        } finally {
          if (bcastOff)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
        }
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
