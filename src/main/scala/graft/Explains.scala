package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries into
  * EXPLAINS.md — the plan-shape evidence behind SCALING.md's claims
  * (pushdown, broadcast selection, partial aggregation, the native
  * as-of operator). Regenerate with:
  * `sbt "runMain graft.Explains /root/testdata/sf0.001 EXPLAINS.md"` */
object Explains {
  val headline = Seq(
    "q04_projection", "q05_filter_conj", "q09_join_multiway",
    "q12_join_broadcast", "q14b_join_asof_native", "q14c_join_asof_bucketed",
    "q13c_join_range_banded",
    "q16_agg_hash", "q24_topk", "q41a_dedup_exact", "q41d_dedup_ngram_jaccard",
    "q41e_dedup_edit_distance", "q41g_dedup_edit_scaled", "q43e_curation_pipeline",
    "q42b_similarity_ann_lsh", "q42c_dedup_embedding_cosine", "q42d_similarity_ivf",
    "q44b_multimodal_frame_sample", "q44c_multimodal_ppm_decode",
    "q45_polygonscan_scan",
    "q45b_polygonscan_wallet_pruning",
    "q46b_full_refresh_catalog", "q47_salted_skew_agg",
    "q50_bucketed_colocated_join", "q51_sample_bernoulli",
    "q51c_split_train_val_test",
    "q52_decontaminate", "q52b_decontaminate_clean", "q54_pack_chunks",
    "q55_repetition_filter", "q56_mix_to_target", "q41h_dedup_incremental",
    "q41i_dedup_incremental_bloom", "q57_funnel_ordered", "q58_cohort_retention",
    "q59_budget_select", "q43g_tfidf_top_terms",
    // round-15 batch 2: warehouse merge + analytics + LM/semantic curation
    "q60_scd2_history", "q60b_cdc_upsert_latest", "q61_sessionize_batch",
    "q47b_salted_skew_join", "q43h_lm_logprob", "q41j_dedup_semantic",
    "q63_approx_percentile", "q62_partitioned_layout_pruning",
    "q64_dynamic_partition_pruning", "q65_quality_audit",
    "q66_snapshot_diff_cdc", "q41k_dedup_incremental_neardup",
    "q67_bucket_pruned_lookup", "q43i_boilerplate_strip",
    "q68_gap_fill_rolling", "q69_balanced_shards",
    // round-15 batch 9: incremental-agg maintenance, profiling,
    // anomaly scoring, frequency sketch, bigram LM
    "q70_incremental_agg_merge", "q71_profile_summary",
    "q72_anomaly_zscore", "q73_heavy_hitters", "q43j_bigram_lm",
    // round-15 batch 10: diversity selection, sequence examples,
    // winsorization
    "q74_cluster_balanced_select", "q75_sequence_examples",
    "q76_winsorize_clamp",
    // round-15 batch 11: quota sampling + percentile-rank normalization
    "q77_stratum_quota_sample", "q78_quality_percentile_rank",
    // round-15 batch 12: audio decode + generation time travel
    "q44d_multimodal_wav_decode", "q80_refresh_time_travel",
    // round-15 batch 13: inverted-index sparse similarity
    "q81_tfidf_more_like_this",
    // round-15 batch 14: SCD2 point-in-time temporal join
    "q82_scd2_point_in_time",
    // round-15 batch 15: kNN label classification
    "q83_knn_label_classify",
    // round-15 batch 16: attribution, PageRank, schema-evolution
    // union, sweep-line concurrency
    "q84_attribution_last_touch", "q85_pagerank_bipartite",
    "q86_schema_evolution_union", "q87_session_concurrency",
    // round-15 batch 17: PQ compression + Z-order layout
    "q88_similarity_pq_adc", "q89_zorder_layout",
    // round-15 batch 18: IVFPQ composition
    "q88b_similarity_ivfpq",
    // round-15 batch 19: group split, eval metrics, CDC chunking
    "q90_group_split", "q91_eval_metrics", "q92_cdc_chunking",
    // round-15 batch 20: market-basket mining + small-file compaction
    "q93_market_basket", "q94_compaction",
    // round-15 batch 21: curriculum decile binning
    "q95_curriculum_bins",
    // round 16: k-means quantizer, residual IVFPQ, HLL sketch merge,
    // and the newly duck-oracled portable minhash
    "q42f_similarity_ivf_kmeans", "q88c_similarity_ivfpq_residual",
    "q96_hll_incremental_distinct", "q41b_dedup_minhash",
    // round-16 batch 2: substring dedup, hashed classifier, DSIR,
    // hard-negative mining
    "q97_substring_dedup", "q97b_substring_strip", "q98_quality_classifier",
    "q99_dsir_importance", "q100_hard_negatives", "q100b_hard_negatives_ivf",
    // round 18: persisted corpus shingle artifact + k-means PQ books
    "q41l_dedup_incremental_neardup_indexed", "q88d_similarity_pq_kmeans",
    "q41m_dedup_incremental_neardup_bucketed",
    "q41n_dedup_incremental_neardup_delta",
    "q42g_similarity_ivf_delta",
    // round 19: LSM bucketed artifact, IVF retrain cadence,
    // perceptual-hash image near-dup
    "q41o_dedup_incremental_neardup_lsm",
    "q41p_dedup_incremental_neardup_compacted",
    "q42h_similarity_ivf_retrain",
    "q44e_multimodal_phash_neardup",
    // round 20: audio near-dup + the composed curation capstone +
    // the streaming LSM accept lifecycle
    "q44f_multimodal_audio_neardup",
    "q101_corpus_pipeline",
    "q79b_stream_neardup_lsm_accept",
    "q79c_stream_ivf_accept")

  /** Prose above a query's plan — the one- paragraph reading guide for
    * the plan properties SCALING.md leans on. Keyed by query name so a
    * full regeneration never loses the annotations. */
  val notes: Map[String, String] = Map(
    "q41l_dedup_incremental_neardup_indexed" ->
      """The corpus side arrives as two parquet SCANS (the ShingleIndex
        |artifact — hashed shingles + df rollup), not a shingling
        |pipeline: look for the plain FileScans where q41k's plan has the
        |tokenize/explode/hash stages. The batch side still shingles; the
        |combined df probes the artifact's rollup with a LEFT join keyed
        |on the batch vocabulary (corpus-only shingles can never reach a
        |verdict, so dfreq/rareSh stay batch-sized).""".stripMargin,
    "q41m_dedup_incremental_neardup_bucketed" ->
      """q41l's BIG-BATCH shape: the corpus artifact arrives BUCKETED
        |per access key — (doc, sh) by sh for the rare probe, a second
        |copy by doc for the candidate fetch, the df rollup by sh — and
        |the probe joins carry MERGE hints (standing in for a
        |rare-shingle relation past broadcast size). The dump below is
        |the final verdict segment (stage barriers split the pipeline
        |into separate jobs, so the bucketed corpus scans live in the
        |UPSTREAM staged jobs); the probe fragments themselves are
        |plan-pinned in ShingleIndexSpec — `Bucketed: true` scans with
        |NO Exchange above them under the SortMergeJoins, both on the
        |sh copy and the doc copy. Only batch-sized relations shuffle;
        |a flat artifact re-shuffles the corpus per batch
        |(ShingleBucketProbe: 78 vs 11 MiB shuffled at 10x corpus,
        |fixed batch).""".stripMargin,
    "q41n_dedup_incremental_neardup_delta" ->
      """The artifact lifecycle's round-2 probe: identical plan family
        |to q41l (artifact FileScans + the batch pipeline) — what
        |changed is WHICH rows the scans hold: the shingle relation now
        |contains batch1's accepted docs via ShingleIndex.append (delta
        |shingling + a rollup-sized df merge, no corpus re-read), so
        |batch2's copies of accepted docs find their match. The
        |maintenance cost itself runs once before this plan and is
        |delta-sized.""".stripMargin,
    "q42g_similarity_ivf_delta" ->
      """The maintained ANN index's probe: identical plan family to
        |q42e (centroid literals + cell-partition-pruned assignment
        |scan) — the difference is on DISK: the assignment partitions
        |now hold appended delta rows assigned under the FROZEN
        |quantizer (IvfIndex.appendAssignments, a delta-sized map +
        |partitioned append run once before this plan). PartitionFilters
        |still prune to the probed cells; delta vectors surface exactly
        |as a from-scratch union assignment would.""".stripMargin,
    "q41o_dedup_incremental_neardup_lsm" ->
      """q41n's lifecycle over the BUCKETED artifact: the corpus arrives
        |as LSM segments — immutable bucketed (sh, doc) table pairs plus
        |one generation df — and the probe runs PER SEGMENT
        |(incrementalNearDupSegmented) under the same MERGE hints as
        |q41m, because a segment UNION would erase the bucketed
        |partitioning and re-shuffle the corpus per batch. The dump below
        |is the final verdict segment (stage barriers split the pipeline
        |into separate jobs); the per-segment probe fragments are
        |plan-pinned in LsmShingleSpec — `Bucketed: true` scans on BOTH
        |copies of BOTH segments with only the batch side shuffling. The
        |append that produced segment 2 committed shingles AND df with
        |one atomic pointer swap; its cost is delta-sized
        |(ShingleBucketProbe: flat 0.05 MiB shuffle at 10x corpus).""".stripMargin,
    "q41p_dedup_incremental_neardup_compacted" ->
      """The post-compaction probe: q41o's plan family collapsed back to
        |ONE segment — compactLsm folded the base+delta segment pairs
        |into a single bucketed pair (one corpus-sized rewrite, committed
        |by the same atomic pointer swap) so the per-segment probe loop
        |degenerates to q41m's single-artifact shape. Identical verdicts
        |to the 2-segment probe (LsmShingleSpec pins invariance; the
        |oracle is q41n's text unchanged) — what compaction buys is the
        |PLAN: half the probe joins, half the candidate-fetch scans,
        |after arbitrarily many appends.""".stripMargin,
    "q79b_stream_neardup_lsm_accept" ->
      """The batch2 probe against an artifact maintained by a STREAM:
        |q41o's per-segment probe family (MERGE-hinted bucketed scans,
        |batch-side-only shuffle) over the generation the foreachBatch
        |loop left behind — four micro-batch accepts, each a delta-sized
        |append behind the atomic pointer swap, with compactLsm fired
        |IN-LOOP the moment shouldCompact hit S* = 4 (segments
        |1→2→3→4 → compact → 1→2). The probe therefore fans out over
        |TWO segments, not five: the derived maintenance rule, not the
        |arrival count, dictates the fan-out — the property that bounds
        |probe cost for an unbounded stream. As with q41o, the dump
        |below is only the final verdict fragment (stage barriers split
        |the per-segment probes into separate upstream jobs); the
        |two-segment state is pinned by StreamingLsmSpec's manifest
        |assertions, and verdicts are pinned ≡ the single-batch
        |lifecycle (the oracle is q41n's text verbatim).""".stripMargin,
    "q79c_stream_ivf_accept" ->
      """The probe against an IVF index grown by a STREAM: q42e/q42g's
        |plan family (centroid literals + cell-partition-pruned
        |assignment scan) over an assignment artifact that four
        |foreachBatch ticks appended under the frozen quantizer —
        |each tick a delta-sized assignment map + crash-safe token
        |splice, followed by the DERIVED retrain trigger evaluated
        |in-loop (quiet on this natural fixture: the measured null
        |result, driftRatio ~1 vs the 1.25 threshold). Per-vector
        |assignment is order-independent, so the plan AND the answers
        |are exactly the batch grow lifecycle's (StreamingIvfSpec pins
        |it; the oracle is q42g's text verbatim) — PartitionFilters
        |still prune to the probed cells.""".stripMargin,
    "q42h_similarity_ivf_retrain" ->
      """The post-retrain probe: identical plan family to q42e/q42g
        |(centroid literals + cell-partition-pruned assignment scan) —
        |what changed is WHICH GENERATION the scan reads: the pointer
        |now names gen-2, whose quantizer was retrained over the grown
        |union (q42f's deterministic k-means) and whose assignment was
        |rebuilt under it, both committed by one atomic pointer swap
        |(IvfIndex.commitGeneration — a torn (quantizer, assignment)
        |pair is unreachable at every crash instant). PartitionFilters
        |prune to the probed cells of the NEW cell layout.""".stripMargin,
    "q44e_multimodal_phash_neardup" ->
      """Perceptual-hash image near-dup: the decode+dHash stage is the
        |justified mapPartitions (binary P6 parse + luma grid — per-row
        |imperative byte work, as q44c), everything after is q41c's
        |relational machinery on the (doc, simhash) relation: a
        |4-rows-per-image chunk explode, the chunk-equality self-join
        |(candidates bounded by bucket occupancy — no pairwise image
        |comparison anywhere), and the bit_count Hamming verify on
        |candidates only. At 100 TB the hash pass is a pure map over
        |the image bytes and only 16-byte (id, hash) rows ever
        |shuffle.""".stripMargin,
    "q44f_multimodal_audio_neardup" ->
      """Audio near-dup — q44e's shape on the RIFF decoder: the
        |decode+fingerprint stage is the justified mapPartitions (chunk
        |walk + 65-window |sample| energy fold — per-row imperative
        |byte work, as q44d), everything after is the shared relational
        |machinery on the (doc, simhash) relation: 4-rows-per-stream
        |chunk explode, chunk-equality self-join, bit_count Hamming
        |verify on candidates only. A gain re-master scales window
        |energies monotonically so the sign bits survive it except at
        |int16 clamp sites. At 100 TB the fingerprint pass is a pure
        |map over the audio bytes and only 16-byte (id, hash) rows
        |ever shuffle.""".stripMargin,
    "q101_corpus_pipeline" ->
      """The capstone's declared plan is the READ side of the pipeline:
        |per-lang audit joins over the persisted stage stats, the
        |stage-and-swap rollup generations (readCurrent/readPrevious
        |FileScans through the pointer), and the post-append re-probe —
        |the q41o per-segment bucketed probe family over the
        |base+accepted LSM generation, batch2-sized relations shuffling
        |only. The WRITE side (quality filter -> exact dedup -> near-dup
        |probe -> appendLsm -> two refreshes) runs once per (JVM,
        |dataset) in the memoized build; every mutation commits behind
        |an atomic pointer swap, and the append's dup guard takes the
        |manifest-summary fast path (batch ids sit above every corpus
        |id — zero segment reads).""".stripMargin,
    "q88d_similarity_pq_kmeans" ->
      """Identical query-time plan to q88 (encode map + broadcast ADC +
        |shortlist window + rerank) — only the codebook LITERALS differ
        |(Lloyd-trained means). The training pass runs before plan
        |construction: one encode pass + an (m, code, j) partial-agg
        |shuffle, M×K×subDim rows collected as literals, not data.""".stripMargin,
    "q90_group_split" ->
      """Group-aware split: the bucket assignment is a map-only expression
        |on user_id (same multiplicative-hash machinery as q51c, different
        |KEY — the whole point), so the only exchange is the per-split
        |audit aggregate. Disjointness is by construction: a user's bucket
        |is a pure function of user_id, so their events cannot straddle
        |splits whatever the partitioning.""".stripMargin,
    "q91_eval_metrics" ->
      """The corpus-shaped work is q83's kNN stage (broadcast-query brute
        |force); ONE groupBy(t, pr) pass collapses predictions to the
        |O(classes²) confusion matrix (round-15 verdict item 6 — the old
        |plan replicated prediction rows per class), and only that tiny
        |broadcast relation is cross-joined per label. Each metric is ONE
        |division from integer counts (F1 via 2tp/(2tp+fp+fn)), so the
        |plan's float surface is three scalar divisions per class
        |row.""".stripMargin,
    "q42f_similarity_ivf_kmeans" ->
      """Identical probe-time plan to q42d — the k-means refinement is
        |entirely BUILD-time (iters × one corpus pass + a cells×dim
        |map-side-combined decimal-sum shuffle, each a bounded driver
        |collect), after which the centroids are the same literal arrays
        |and assignment stays a pure map. The dial trades build passes for
        |tighter cells without touching query cost.""".stripMargin,
    "q88c_similarity_ivfpq_residual" ->
      """Same pruning shape as q88b (probe→assign join bounds everything
        |downstream); the residual refinement adds one cells×dim mean
        |collect at build and makes the query ADC tables per-(query,
        |probed-cell) — still broadcast-sized (nprobe × M × 16 decimals
        |per query). Measured: residual tables recover half the
        |ADC-vs-ceiling recall gap at the derived nprobe.""".stripMargin,
    "q96_hll_incremental_distinct" ->
      """The incremental-distinct shape: per-(generation, group) HLL
        |sketch partials aggregate with map-side combine (each partial is
        |a KB-scale binary), the refresh unions O(groups) sketches, and
        |the exact COUNT(DISTINCT) twin beside it is the oracle surface.
        |At 100 TB the refresh reads the delta plus stored sketches —
        |never the history.""".stripMargin,
    "q41b_dedup_minhash" ->
      """Portable-family minhash (round 16): the signature stage is ONE
        |fused map expression (shingling, Horner-fold base, 32 affine
        |lane mins — no explode, no aggregation shuffle), staged once so
        |the LSH self-join reads it from blocks instead of recomputing
        |both sides; band keys are comma-joined decimal strings (oracle-
        |replayable), candidates dedupe before the estimated-Jaccard
        |verify. Plan shape identical to the xxhash64 variant — only the
        |hash family changed, which is what flipped the query from
        |rows-only to duck-checked.""".stripMargin,
    "q97_substring_dedup" ->
      """Sub-document dedup (Lee et al. 2022): the gram explode is the
        |only corpus-×L pass; the global frequency groupBy shuffles 8-byte
        |portable HASHES (the gram strings never leave their partitions
        |for the count), and only occurrences whose hash repeats join back
        |for the exact-string verify — the find→verify split that makes a
        |~30-bit hash safe at any scale. Span merging is one per-doc
        |window (running max of span end), so overlapping grams of a long
        |repeated passage cost one row each, never L. The left join back
        |to the doc list is the only full-corpus exchange after the gram
        |stage.""".stripMargin,
    "q97b_substring_strip" ->
      """q97's realization: same find→verify span pipeline, then covered
        |positions explode from the VERIFIED spans only (duplicated
        |occurrences × L rows — corpus-linear by the measured q97 law),
        |the anti-join keeps survivors, and reassembly is one per-doc
        |aggregate (array_sort over (pos, token) structs). The full
        |cleaned string hash-checks — the span arithmetic has nowhere to
        |hide.""".stripMargin,
    "q98_quality_classifier" ->
      """The hashing-trick plan: NO vocabulary relation, NO join, no
        |explode — scoring is one fused kernel expression
        |(BucketWeightSum) walking each token array once with the weight
        |array riding codegen as a reference object. The whole query is a
        |map over the corpus followed by nothing: verdicts are computed
        |where the text lives. At 100 TB this is the difference between a
        |model-based filter that costs one scan and one that shuffles a
        |tokenized corpus against a vocabulary table.""".stripMargin,
    "q99_dsir_importance" ->
      """DSIR in three bounded stages: ONE tokenized pass builds both
        |hashed-unigram histograms (conditional aggregate, map-side
        |combined, D=1024 rows out); the log-ratio table collects to a
        |D-long literal (the Pq codebook discipline) so the corpus-wide
        |scoring pass is the same fused map kernel as q98 — zero explode,
        |zero join at score time; selection is Ranking.globalRank's range
        |exchange (no single-partition window) + an O(1) count broadcast
        |for the ⌈n/4⌉ cut. The SQL dual deliberately plans the naive
        |global window and must hash-agree — the q78/q95 proof
        |pattern.""".stripMargin,
    "q100_hard_negatives" ->
      """Hard-negative mining: q42's broadcast-query brute shape with
        |the label-mismatch predicate in the JOIN CONDITION — same-label
        |pairs are never generated, not filtered after scoring — and the
        |per-query top-3 as a WindowGroupLimit (both sides of the
        |exchange), so no candidate relation is ever fully sorted. The
        |exact pass is the baseline contract; at 100 TB the mining batch
        |rides the IVF/PQ probe (q88b) with this predicate applied at the
        |probe join.""".stripMargin,
    "q100b_hard_negatives_ivf" ->
      """q100's scale path composed: the q42d quantizer/assign/probe
        |prefix bounds candidates to nprobe/cells of the corpus BEFORE the
        |label predicate and exact scoring run; per-pair cosines are
        |bit-identical to the exact op (spec-pinned), only the candidate
        |SET shrinks. Measured: 2.4× wall growth across the decade vs the
        |exact op's 5.5×, recall 0.883/0.795 at the derived nprobe.
        |Production mining loads the q42e build-once index — the per-call
        |quantizer build visible in this plan is the bench-scale
        |overhead, not the deployment shape.""".stripMargin,
    "q95_curriculum_bins" ->
      """NTILE without the single-partition window: the plan's global
        |order is a RANGE exchange (globalRank — per-partition row_number
        |plus collected per-partition offsets), the bucket is NTILE's
        |integer closed form as a map expression over (rank, n, k), and
        |the 10-row per-bin aggregate partial-aggregates map-side. The SQL
        |dual's plan IS the naive global window (one partition carries the
        |corpus) — the pair exists to prove, by hash equality, that the
        |distributed formulation is the same function; at 100 TB only the
        |range-shuffle plan survives.""".stripMargin,
    "q93_market_basket" ->
      """Apriori level-2 in one plan: the basket relation shuffles once on
        |(okey, item) for the distinct, the frequent-item prefilter joins a
        |broadcast 25-row relation, and the pair self-join shuffles both
        |sides on okey (co-partitioned) with the (item_a, item_b) count
        |partial-aggregating map-side. Item counts and the basket total are
        |O(items)/O(1) relations broadcast onto the ≤ C(items,2)-row result.
        |The prefilter IS the scale guard: pair cost is Σ per-basket k² with
        |k bounded by the frequent-item count, so a long-tail vocabulary
        |can never explode the join.""".stripMargin,
    "q94_compaction" ->
      """The readback plan is the point: after compaction the scan opens
        |ceil(bytes/target) files instead of the 64 the fragmented ingest
        |left — at 100 TB the per-file open/footer cost and the driver's
        |listing are what compaction buys back. The rewrite itself is one
        |read + one round-robin repartition + one staged write behind the
        |same atomic pointer swap as any refresh (round-robin, not
        |coalesce: adjacent-partition merging would inherit the fragment
        |skew; uniform output files are the point of the operation).""".stripMargin,
    "q92_cdc_chunking" ->
      """One explode pass tags every token with its boundary bit (the
        |Horner-fold hash is a codegen'd expression in the scan stage);
        |one per-doc window turns boundary bits into chunk ids; the
        |(doc, chunk) aggregate rides the window's doc_id partitioning —
        |one exchange total. Per-doc window state is one running count,
        |whatever the document length.""".stripMargin,
    "q88b_similarity_ivfpq" ->
      """The Faiss composition in one plan: the probe→assign join prunes
        |candidates to nprobe/cells of the corpus BEFORE any ADC work (the
        |cand relation is the only corpus-shaped thing downstream), codes
        |and broadcast query tables score the survivors with lookups, and
        |the exact rerank touches only the shortlist. Recall is bounded by
        |the coarse probe stage (PQ reorders within probed cells, never
        |resurrects a pruned vector — the spec pins the law); tuning
        |recall means nprobe, tuning bytes means the code width.""".stripMargin,
    "q88_similarity_pq_adc" ->
      """PQ two-stage: encode is a pure map (argmin over centroid literals,
        |no shuffle — the codes relation is the 16×-compressed artifact);
        |the ADC stage joins codes against the BROADCAST query distance
        |tables and cuts a 100-deep shortlist per query (decimal-exact ADC
        |sum, no IEEE tree); only the shortlist re-attaches real vectors
        |for the exact rerank. At 100 TB the corpus-proportional work is
        |the code scan — 16 bytes/vector, lookups only.""".stripMargin,
    "q89_zorder_layout" ->
      """Morton-key layout: the z-value is pure integer bit arithmetic in
        |the scan stage (shifts/masks — exact on both engines), the tile
        |aggregate is O(tiles). The point is the EXTENTS the output proves:
        |every 64-wide z tile spans ≤ 8 on BOTH user and day axes, so
        |files written in z-order carry tight min/max on both columns and
        |data-skipping prunes on either — the OPTIMIZE ZORDER primitive
        |beside q62's partitioning and q67's bucketing.""".stripMargin,
    "q83_knn_label_classify" ->
      """Exact-kNN vote: the neighbor stage is the q42 broadcast-query brute
        |force (query slice broadcasts, corpus never shuffles), the top-5 cut
        |is a WindowGroupLimit per qid, and the vote/prediction aggregates
        |run over query-sized relations. The production path swaps q42e's
        |IVF probe into the neighbor stage unchanged.""".stripMargin,
    "q84_attribution_last_touch" ->
      """Last-touch attribution in ONE user_id window pass: three
        |last(_, ignoreNulls) columns share a single Window operator (same
        |spec), each buffering one row of state — no self-join of purchases
        |back against the event corpus, which would rescan and re-shuffle
        |it. The purchase filter sits above the window (it must see
        |non-purchase rows), so the corpus cost is the one exchange.""".stripMargin,
    "q85_pagerank_bipartite" ->
      """Bounded-iteration PageRank: the edge derivation joins and
        |distincts ONCE (cached memory-and-disk — the iterate-over-edges
        |trade GraphX makes), and each of the three iterations is
        |edges ⋈ ranks ⋈ degrees with a partial-aggregated groupBy(dst).
        |Rank/degree relations are O(nodes); join strategy is left to
        |Catalyst (BHJ here, SMJ on src at web-scale node counts). All
        |arithmetic is 64-bit integer — the plan contains no float op, so
        |the result is bit-stable whatever the partial-agg order.""".stripMargin,
    "q86_schema_evolution_union" ->
      """Schema-evolution union: two pruned scans of the same parquet
        |(disjoint id slices), aligned BY NAME with typed null fill —
        |map-only, no exchange beyond the presentation sort. The v1
        |branch's ReadSchema carries
        |only the columns the old generation had; positional union would
        |misalign the moment either schema reorders.""".stripMargin,
    "q87_session_concurrency" ->
      """Sweep-line interval algebra: session intervals become ±1 markers
        |(2×sessions rows, far below event volume), and the global running
        |concurrency is Ranking.globalPrefixSum — range exchange on
        |(ts, delta desc, user, session), per-partition offsets as a
        |driver-side literal map, partition-LOCAL window sum. No
        |single-partition window; the per-day peak is a tiny final
        |aggregate.""".stripMargin,
    "q82_scd2_point_in_time" ->
      """The interval formulation the oracle (and the _sql dual) writes never
        |appears in this plan: the as-of rewrite unions facts with the
        |version feed and resolves the containing version with ONE per-key
        |running-last window — each relation shuffles once on cust_id, no
        |interval theta-join, no dimension replication. Interval ≡ as-of
        |because version intervals chain; the hash equality is the
        |proof.""".stripMargin,
    "q81_tfidf_more_like_this" ->
      """Inverted-index sparse similarity: the pair generator is a term-keyed
        |join (query weights × posting lists) — no all-pairs stage exists in
        |the plan — and the (qid, did) dot aggregate runs partial map-side
        |before its exchange. Every sum is exact int64 micro-units (round
        |16: was decimal — the BigDecimal accumulate over 4.5M pair rows
        |was the suite's top cost, 5.9→3.7 s at sf0.1 with identical 6-dp
        |weights; overflow bound documented at the op); the one double
        |division sits above the final join.""".stripMargin,
    "q44d_multimodal_wav_decode" ->
      """q44c's audio twin: binary WAV payloads synthesized and decoded
        |partition-wise (the justified mapPartitions — a RIFF chunk walker is
        |not a relational expression), then a plain partial+final aggregate.
        |The decode never leaves the task: no shuffle carries payload
        |bytes.""".stripMargin,
    "q80_refresh_time_travel" ->
      """Two generation scans (live + retained predecessor) joined on the
        |rollup key — both sides are O(groups) parquet reads resolved via the
        |pointer protocol, so time travel costs two small scans and no
        |corpus work. The refreshes themselves are the q46 stage-and-swap
        |path.""".stripMargin,
    "q77_stratum_quota_sample" ->
      """The load-bearing node is WindowGroupLimit (Partial below the
        |(lang, source) exchange, Final above it): Catalyst rewrites
        |row_number ≤ 10 into a per-group TOP-K, so each map task keeps at
        |most 10 rows per stratum BEFORE shuffling and the stratum is never
        |sorted in full — the rewrite that makes a quota sample viable on a
        |billion-doc stratum. SamplerSpec pins the node.""".stripMargin,
    "q78_quality_percentile_rank" ->
      """The DataFrame entry plans Ranking.globalRank — range exchange on
        |(n_chars DESC, doc_id), per-partition row_number + literal offset
        |map — with the 1-row count broadcast on top; no single-partition
        |window. Its `_sql` twin deliberately carries the naive global-window
        |text and must hash-agree, documenting the rewrite a user's SQL gets
        |for free by switching entries.""".stripMargin,
    "q74_cluster_balanced_select" ->
      """Diversity-preserving subsample: cell assignment is a pure map over
        |the corpus (argmax against centroid literals — the q42d quantizer,
        |built once and collected as a few KB), so the ONLY exchange is the
        |per-cell ranking window: `cells` partitions whose combined input is
        |the corpus. No all-pairs stage, no global sort.""".stripMargin,
    "q75_sequence_examples" ->
      """Lead-chain formulation: one user_id exchange feeds row_number + three
        |lead()s in a SINGLE Window operator (same spec), with a bounded
        |3-row look-ahead buffer — a collect_list formulation would buffer a
        |bot user's whole history in one task. Output rows = events with ≥ 3
        |successors, linear in the corpus.""".stripMargin,
    "q76_winsorize_clamp" ->
      """The per-language bounds aggregate is O(languages) rows — bounded by
        |the world's language count at any corpus size, so the explicit
        |broadcast is scale-safe by construction (contrast the per-user
        |relations in q57/q58, deliberately left to Catalyst). The clamp is a
        |map-only expression in the scan stage.""".stripMargin,
    "q70_incremental_agg_merge" ->
      """Partial-aggregate merge: base and delta each collapse to
        |(month, status) partials — two partial+final HashAggregate pairs
        |over DISJOINT pushed-down date slices of the scan — and the merge
        |re-aggregates the union of partials. At 100 TB the base partials are
        |a stored O(groups) table, so a refresh reads only the delta; the
        |oracle recomputing over ALL rows proves merge(partials(A),
        |partials(B)) ≡ agg(A ∪ B) bit-exactly (decimal sums).""".stripMargin,
    "q71_profile_summary" ->
      """One aggregate pass melted by `stack` carries all scalar metrics (no
        |per-metric re-scan); each COUNT(DISTINCT) is its own single-column
        |shuffle — deliberately OUTSIDE the main aggregate so Catalyst does
        |not plan an Expand (row-tripling) over the corpus; the histogram is
        |one integer-DIV groupBy. Report is O(metrics) rows at any corpus
        |size.""".stripMargin,
    "q72_anomaly_zscore" ->
      """The corpus-proportional work is ONE (event_type, day) partial+final
        |aggregate; the trailing-window z-score runs over the DAYS relation
        |(types × days rows). The window carries only exact BIGINT sums
        |(Σcnt, Σcnt², n) — μ/σ²/z derive in one fixed IEEE expression tree,
        |no stddev accumulator, so the hash is engine- and
        |partitioning-proof.""".stripMargin,
    "q73_heavy_hitters" ->
      """Sketch-vs-exact discipline for FREQUENCY (q35 = distinct, q63 =
        |quantiles): the exact top-10 is a term-keyed partial+final count
        |aggregate plus a row_number over the vocab-sized distinct relation;
        |the approx_top_k ItemsSketch is ONE pass with KB state — the 100 TB
        |path. maxItemsTracked ≥ vocab ⇒ the estimate is exact, so sketch_ok
        |is a hard equality; sketch k (50) > report k (10) absorbs
        |count-tie reordering at the boundary.""".stripMargin,
    "q43j_bigram_lm" ->
      """One bigram-explode pass feeds both the (a,b) count aggregate and the
        |scoring join; c(a) and V come from the token pass; the 1-row V
        |broadcasts. The per-doc mean is EXACT integer micro-nat arithmetic
        |(sum + DIV) — no decimal/double rounding boundary anywhere in the
        |mean (the davg half-boundary bites at sf0.1 doc 1705).""".stripMargin,
    "q59_budget_select" ->
      """Distributed global prefix sum — range shuffle on (quality DESC, doc_id),
        |per-partition offsets as a literal map (driver-side, bounded by the
        |partition count), whole-partition budget prune BELOW the window's
        |exchange (`Filter (offset <= …)` under `Exchange hashpartitioning(_pid)`
        |— only the affordable slice re-shuffles), partition-local window sum.
        |No single-partition global window anywhere.""".stripMargin,
    "q60_scd2_history" ->
      """Type-2 history: the four feed branches are ONE union of pushed-down
        |customer scans; the only exchange is the cust_id hash shuffle feeding
        |the per-key lead() window (version chains ≤ 3 rows — bounded window
        |buffers at any key count).""".stripMargin,
    "q60b_cdc_upsert_latest" ->
      """CDC latest-wins via max(struct(eff, attrs…)) as an AGGREGATE, not a
        |window: the partial SortAggregate runs MAP-SIDE (its Sort is
        |task-local, by grouping key) and collapses each task to ≤ 1 row per
        |key, so the exchange carries keys — a row_number window would
        |shuffle the whole feed and sort every key group reduce-side. The
        |upsert shape that survives a 100 TB changelog.""".stripMargin,
    "q61_sessionize_batch" ->
      """One user_id exchange feeds the whole query: lag window, running-sum
        |session index, AND the (user_id, session_idx) aggregate —
        |HashPartitioning(user_id) satisfies the aggregate's clustered
        |distribution (subset key), so no second shuffle appears between the
        |window and the groupBy.""".stripMargin,
    "q47b_salted_skew_join" ->
      """Skew-salted join: the part side explodes 8 salt copies, lineitem tags
        |rows with xxhash64(identity)%8, and the ShuffledHashJoin keys on
        |(partkey, salt) — a hot key's rows spread over 8 reducers. The salt
        |dies inside the join; the aggregate above is the plain q09-style
        |partial+final pair.""".stripMargin,
    "q43h_lm_logprob" ->
      """One explode pass feeds the term-count aggregate (map-side combine);
        |the 1-row corpus total broadcasts onto the token stream; the
        |token→count join is term-keyed (BHJ at this vocabulary). Per-token
        |ROUND before the decimal mean keeps the hash partitioning-proof.""".stripMargin,
    "q41j_dedup_semantic" ->
      """SemDeDup end-to-end: LSH-bucketed candidate pairs (no all-pairs
        |stage), cosine filter, pointer-jumping components (the bounded-round
        |loop is upstream of this final plan), then a left join that folds
        |singletons back in and a comp-keyed size aggregate. Every relation
        |after the pair stage is a sliver of the corpus.""".stripMargin,
    "q62_partitioned_layout_pruning" ->
      """The storage-layout lever: events laid out partitionBy(event_date),
        |day-equality predicate becomes `PartitionFilters` on the scan — the
        |listing touches ONE day's directory (PlanSpec pins numFiles ≤ 8 of
        |the 30-day layout) and the other days' bytes are never read. At
        |100 TB this is the difference between a 3 TB day scan and a full
        |sweep; the oracle proves pruning changes no rows.""".stripMargin,
    "q64_dynamic_partition_pruning" ->
      """q62's literal day filter, generalized to the star-schema case: the
        |pruning set comes from a JOIN against the filtered calendar dim, so
        |the scan's PartitionFilters carry a `dynamicpruningexpression` fed
        |by the reused broadcast — only the audit days' directories are
        |listed. Two things had to be true for the rule to fire (both
        |documented at the query): the dim is a STORED table (a literal Seq
        |constant-folds its Filter away) and the predicate is a comparison
        |(a bare boolean flag fails isLikelySelective).""".stripMargin,
    "q69_balanced_shards" ->
      """Token-balanced sharding on the factored-out Ranking.globalRank:
        |range exchange on (n_tokens DESC, doc_id), per-partition counts
        |collected driver-side (bounded by partition count), partition-
        |LOCAL row_number + offset — the same no-global-window discipline
        |as q59, now reusable. The dealing aggregate is a tiny per-shard
        |rollup.""".stripMargin,
    "q43i_boilerplate_strip" ->
      """The C4 boilerplate rule as one pass: posexplode lines, line-hash
        |frequency aggregate (map-side combine; the relation is distinct-
        |line-sized), frequency join back, per-doc ordered reassembly via
        |array_sort(collect_list(struct(pos,line))) — per-doc state is that
        |doc's own lines. No pattern list anywhere; the corpus itself
        |defines what is chrome.""".stripMargin,
    "q68_gap_fill_rolling" ->
      """Date-spine densification: the spine explodes sequence() per user
        |(users × 30 rows — calendar-bounded, never event-bounded), one
        |co-keyed left join fills the gaps with explicit zeros, and the
        |7-day rolling average rides the same user_id partitioning as the
        |fill join's shuffle.""".stripMargin,
    "q67_bucket_pruned_lookup" ->
      """The bucketed-table point lookup: the IN-list on the bucketing key
        |prunes the scan to the buckets the literals hash to
        |(`SelectedBucketsCount: 2 out of 8`, Bucketed: true), and the
        |aggregate keyed on the same column runs WITHOUT an exchange — the
        |layout serves lookup and co-located aggregation at once. Note the
        |aggregate is load-bearing: with nothing downstream needing the
        |bucketing, DisableUnnecessaryBucketedScan drops the bucketed read
        |and the pruning with it.""".stripMargin,
    "q41k_dedup_incremental_neardup" ->
      """Cross-corpus near-dup: the batch and corpus shingle relations join
        |only through the blocking keys (rare shingles two-sided, plus the
        |unpaired-doc fallback's least-hot keys), then the pair-bounded
        |common-count enumeration — the corpus never self-joins, and its
        |hashed-shingle relation is the only thing it contributes (the
        |persistable artifact at 100 TB). The final verdict is a left join
        |of the batch id list against the pair aggregate.""".stripMargin,
    "q65_quality_audit" ->
      """Load-gate constraint audit: five independent checks, each a single
        |aggregate or a co-partitioned LEFT ANTI join (both referential
        |directions share the orders↔customer key shuffle shapes), unioned
        |into a rows-per-check report. Nothing in the plan scales with
        |anything but the audited tables; the report is O(checks).""".stripMargin,
    "q66_snapshot_diff_cdc" ->
      """Snapshot diff: ONE full-outer SortMergeJoin on the key (both
        |snapshots shuffle once), payload inequality filter drops unchanged
        |rows before the output, verdict is a CASE over null-sides. The
        |inverse of q60's merge — WarehouseAnalyticsSpec pins
        |old + diff == new.""".stripMargin,
    "q63_approx_percentile" ->
      """Exact percentile (sort-based buffer) and the Greenwald-Khanna approx
        |sketch computed in the SAME two-phase aggregate pass — the approx
        |side's state is a KB-scale summary regardless of input rows, which
        |is the 100 TB path; the exact twin is the correctness anchor.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "EXPLAINS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# EXPLAINS — physical plans of the headline queries\n\n")
    sb.append("Generated by `graft.Explains` (sf0.001). The properties\n")
    sb.append("SCALING.md claims are visible below: `PushedFilters`/`ReadSchema`\n")
    sb.append("on every scan, `BroadcastHashJoin` for small dims, partial\n")
    sb.append("(`HashAggregate` x2) aggregation, `AsOfJoinExec` for q14b, and\n")
    sb.append("the polygonscan scan description with its pushed block range.\n\n")
    headline.foreach { name =>
      // q50 models the 100 TB regime (both sides too big to broadcast,
      // PlanSpec's setting): with broadcast off, the plan below shows
      // the bucketed sort-merge join reading co-located buckets with NO
      // Exchange under the join — the only shuffles left are the
      // two-phase aggregation on the (tiny) group key.
      val bcastOff = name.startsWith("q50")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (bcastOff) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // force AQE final plan
        sb.append(s"## $name\n\n")
        notes.get(name).foreach(n => sb.append(n).append("\n\n"))
        sb.append("```\n")
        sb.append(df.queryExecution.executedPlan.toString.take(6000))
        sb.append("\n```\n\n")
        if (bcastOff) {
          val join = graft.queries.Ingest.bucketedJoinInput(spark, sfDir)
          join.collect()
          sb.append(s"## $name — bare bucketed join (broadcast off): no Exchange\n\n```\n")
          sb.append(join.queryExecution.executedPlan.toString.take(6000))
          sb.append("\n```\n\n")
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
