"""Regenerate PLANS.md: formatted physical plans for the headline
queries with scale commentary. Run: PYTHONPATH=. python tools/explain_plans.py
"""

from __future__ import annotations

import contextlib
import io

from pg2kafka_spark.queries import QUERIES
from pg2kafka_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

COMMENTARY = {
    "revenue_by_region": (
        "TPC-H Q5 star join. All four dimension sides broadcast "
        "(`BroadcastHashJoin` ×4, zero `SortMergeJoin`), so the lineitem "
        "fact never shuffles for the join; the only plain `Exchange` is the "
        "final 5-group aggregation, fed by a map-side partial. At 100 TB, "
        "when customer outgrows the broadcast threshold, AQE flips exactly "
        "that join to shuffle — the plan text is the policy, not the size."
    ),
    "pricing_summary": (
        "TPC-H Q1. `PushedFilters` carries the shipdate predicate into the "
        "parquet reader, `ReadSchema` shows only the 7 touched columns "
        "(l_orderkey/l_comment never leave the scan), and two "
        "`HashAggregate` levels (partial_sum before the exchange) mean the "
        "shuffle carries one row per (flag,status) per input partition."
    ),
    "latest_state_per_user": (
        "Per-key latest-state compaction (the flagship CDC-consumer "
        "query) as `max_by` aggregation: `partial_max_by` runs map-side, so "
        "the shuffle is ≤1 row per key per partition. The window "
        "formulation (`row_number desc = 1`) would instead sort every "
        "version of every key through the exchange — same answer, "
        "unbounded shuffle. No `Window` node appears."
    ),
    "unprocessed_page": (
        "The reference's `WHERE processed=false ORDER BY id LIMIT 1000` "
        "outbox page. `TakeOrderedAndProject` keeps a 1000-row heap per "
        "partition (no global sort), and the predicate is in "
        "`PushedFilters` — the partial-index analog."
    ),
    "embedding_topk": (
        "Brute-force ANN baseline: queries broadcast "
        "(`BroadcastNestedLoopJoin` against the tiny query side), cosine "
        "runs map-side, and `WindowGroupLimit` bounds each partition to "
        "k rows per query before the rank shuffle."
    ),
    "embedding_ann_ivf": (
        "IVF scale path: centroids and probe lists broadcast; the corpus "
        "is scanned once for assignment and joined to probes by cell id — "
        "no corpus self-join anywhere in the plan."
    ),
    "minhash_lsh_pairs": (
        "LSH discovery path: the JVM side emits one xxhash64 per token; "
        "shingle composition AND the k-permutation min-fold run fused in "
        "one Arrow kernel (`ArrowEvalPython`) — no shingle strings, no "
        "array_distinct (a min is duplicate-blind). The self-join "
        "shuffles only (id, band, bucket); hot buckets (boilerplate "
        "clusters sharing whole signatures) are removed pre-join by a "
        "broadcast ANTI-join against the aggregated over-cap key set — "
        "a map-side filter, not a re-shuffle. The 64-long signature is "
        "joined back per *deduped* candidate pair, not carried through "
        "the band explosion."
    ),
    "user_event_rollup_salted": (
        "Salted two-phase aggregation: two `Exchange`s — hash on "
        "(user_id, __salt), then hash on user_id — each fed by a "
        "map-side partial `HashAggregate`. This is the shape for the "
        "Zipfian key AQE cannot help with (AQE splits partitions, not "
        "keys). Summed doubles go through DECIMAL so the result is "
        "bit-stable under any partition layout — the plan's exchanges "
        "change with core count, the answer must not."
    ),
    "doc_pii_scrub": (
        "Map-only scrub: chained `regexp_replace` + split-count "
        "expressions inside one `WholeStageCodegen` projection over the "
        "scan — no shuffle, no Python. At 100 TB this is scan-bound, "
        "exactly what a redaction pass should be."
    ),
    "embedding_near_dup_lsh_pairs": (
        "Discovery-path near-dup: per hyperplane table one uniform "
        "bucket shuffle, then `FlatMapGroupsInPandas` — the per-bucket "
        "pairwise cosine runs as ONE symmetric BLAS matmul per bucket "
        "group; candidate pairs never exist as rows on the JVM side. "
        "Contrast with embedding_near_dup_pairs (exact, all-pairs via "
        "num_blocks× replication): same kernel shape, but work is "
        "bucket-local, so the formulation survives 10⁹ vectors."
    ),
    "doc_repetition": (
        "Gopher-style repetition gate: explode bigrams → two-level "
        "aggregate (gram counts, per-doc max) on uniform keys, "
        "broadcast-joined back to the per-doc token counts. Two "
        "exchanges total, both with map-side partials."
    ),
    "multimodal_features_real": (
        "Real-codec path: two partition-preserving `MapInPandas` stages "
        "(encode fixture → decode/feature) and a 3-group aggregate. No "
        "shuffle until the final rollup; decode parallelism == input "
        "splits, the right shape for MB-scale binary rows."
    ),
    "event_asof_order": (
        "As-of join via the union trick: NO join node in the plan — both "
        "sides union, one hash `Exchange` on the key, and `last(ignorenulls)` "
        "over an unbounded-preceding `Window` carries the latest right row "
        "onto each left row. A naive formulation would be a theta join "
        "(`BroadcastNestedLoopJoin`) or a per-key sort-merge + backward "
        "scan; this is one shuffle, same cost shape as any windowed query."
    ),
    "order_event_attribution": (
        "Range join bucketed to an equi-join: intervals explode to their "
        "covered week buckets (≤2 rows each), points land in one bucket, and "
        "the join key becomes (user, bucket) — hash-joinable, AQE-skew-"
        "splittable. The residual `ts BETWEEN` runs as a post-join filter. "
        "The naive `ON key = key AND ts BETWEEN s AND e` would plan a "
        "nested-loop join: O(|orders|x|events|) at 100 TB."
    ),
    "tfidf_top_terms": (
        "Fixed-point tf-idf: two uniform-key shuffles (term-level tf and "
        "df aggs, both with map-side partials), the 1-row corpus count "
        "broadcast, and the per-doc top-3 bounded by `WindowGroupLimit` "
        "before the rank shuffle. Integer scoring — no float rank flips "
        "between engines."
    ),
    "minhash_signatures_portable": (
        "Portable minhash twin: zero `Exchange` — scan → one projection "
        "computing all k mins over the in-row shingle-hash array → "
        "`Generate` (posexplode) of the k-element signature. The shingle "
        "array never crosses the explode; output fan-out is k rows × "
        "(id, i, minhash), nothing wider."
    ),
    "simhash_portable": (
        "Portable simhash twin: zero `Exchange`, no `Generate` — the "
        "token-hash array is built once per row and the n_bits vote "
        "passes all run inside the same projection. One output row per "
        "document regardless of length."
    ),
    "exact_dedup_documents": (
        "Exact dedup is one uniform-key (md5) shuffle with map-side "
        "partial aggregation — the minimum possible movement for a "
        "global group-by, skew-free by construction."
    ),
    "snapshot_part": (
        "Snapshot scan → SNAPSHOT events: no `Exchange` at all. JSON "
        "serialization runs inside whole-stage codegen next to the scan; "
        "parallelism = input splits."
    ),
    "decontamination_check": (
        "Benchmark decontamination: the eval set's distinct gram hashes "
        "build once and BROADCAST (`BroadcastHashJoin`, no "
        "`SortMergeJoin`) — benchmarks are MBs against a 100 TB corpus, "
        "so the corpus side is a linear explode + map-side membership "
        "join; the only plain shuffle is the per-doc count on uniform "
        "doc_id keys with a map-side partial."
    ),
    "doc_duplicate_ngrams": (
        "Exact-substring self-overlap: the gram table is built from one "
        "linear explode; the shared-gram set is a map-side-partial count "
        "over (gram, doc)-distinct rows (hot boilerplate grams combine "
        "before the exchange — deliberately NOT a window, which couldn't "
        "partial-aggregate), and the join back is gram-keyed against a "
        "single-row-per-gram side, so AQE's skew split covers any "
        "residual hot gram. Two uniform-key shuffles + one per-doc count."
    ),
    "source_mix_rebalance": (
        "Data-dependent corpus mixing: per-source counts reduce to a "
        "|sources|-row rate table that BROADCASTS back "
        "(`BroadcastHashJoin`, no `SortMergeJoin`), so the keep/drop "
        "decision — integer ppm hash arithmetic — runs map-side in the "
        "scan stage. The only plain exchange is the tiny count "
        "aggregation."
    ),
    "near_dup_canonical": (
        "Canonical selection over duplicate clusters: the component "
        "labels come out of the min-label-propagation loop as a "
        "localCheckpoint-ed table (`Scan ExistingRDD` — the iterative "
        "lineage is truncated, so downstream replans can't re-run the "
        "loop), joined back to the corpus on uniform doc ids, then ONE "
        "window exchange on component_id computes rank and size "
        "together. The loop itself is one edge⋈label shuffle + one "
        "min-aggregate per round, rounds = duplicate-cluster diameter "
        "(cliques: 1)."
    ),
    "multimodal_decode_parity": (
        "Oracle twin of the real-codec path: encode fixture → decode "
        "census as two partition-preserving `MapInPandas` stages, no "
        "shuffle anywhere — the oracle comparison happens outside the "
        "plan. Integer functionals of the decoded signal keep the "
        "check exact at any partitioning."
    ),
    "semantic_dedup_embeddings": (
        "SemDeDup: k-means training reuses the IVF plan (centroids "
        "BROADCAST both directions, assignment map-only over the "
        "corpus), then ONE grouped-map BLAS task per cluster does the "
        "within-cluster prune — the quadratic pair scan is bounded by "
        "cluster size, which n_centroids controls (paper-scale: 10⁴-10⁵ "
        "clusters for 10⁹ vectors). One cid exchange feeds "
        "`FlatMapGroupsInPandas`; nothing else shuffles."
    ),
    "bloom_semijoin_prune": (
        "Bloom semi-join pushdown: the urgent-key bitset reduces to ONE "
        "array row (`bit_or` partials map-side, ≤ m/32 word rows "
        "through the exchange) and BROADCASTS; the fact probe is then "
        "pure column algebra inside the scan stage — the fact table "
        "never shuffles at all. This is the plan that replaces a 100 TB "
        "`SortMergeJoin` with a 4 KiB broadcast when only the pruned "
        "count/rows are needed downstream."
    ),
    "user_heavy_hitters_cm": (
        "Count-min heavy hitters: the 4×64 counter table aggregates "
        "with map-side partials (state O(depth·width), independent of "
        "N) and BROADCASTS to the probe side; probes are the distinct "
        "keys (one uniform-key exchange) min-reduced over their 4 "
        "counters. No sort, no skew exposure — hot keys only make "
        "counters bigger, not partitions."
    ),
    "embedding_topk_quantized": (
        "SQ8 quantized search: per-dimension stats are ONE aggregate "
        "row (128 min/max partials, map-side) broadcast to encode both "
        "sides; the int8 code table materializes as the stored index "
        "(`InMemoryTableScan`), and scoring dequantizes from codes in "
        "its own codegen stage — kept SEPARATE from the encode stage "
        "on purpose: fused, the generated method passes the JVM 64 KB "
        "limit and Janino fails per-execution (r7 root cause, "
        "BASELINE.md). Queries broadcast; top-k is the "
        "`WindowGroupLimit` bounded-heap — the brute-force plan over "
        "4× fewer index bytes."
    ),
    "doc_unigram_surprisal": (
        "Unigram-LM scoring: two uniform-key exchanges (term counts, "
        "per-doc re-aggregation) plus a broadcast 1-row corpus total — "
        "the tf-idf plan shape. The per-token log happens once per "
        "joined row map-side; the per-doc sum is exact BIGINT micro-"
        "bits, so the aggregate partial-combines without float-order "
        "caveats."
    ),
    "doc_chunk_windows": (
        "Context chunking: tokenize → explode stride offsets → slice, "
        "all inside one `WholeStageCodegen` scan stage — zero "
        "exchanges, output bounded at window/stride (2×) of the input "
        "rows. The chunker a 100 TB pretokenization pass wants: "
        "partition-preserving, no driver involvement."
    ),
    "doc_segment_scrub": (
        "Corpus-wide duplicated-segment removal (line-dedup analog): "
        "segmentation is map-only in the scan (non-overlapping windows, "
        "1× expansion); the dup-set groupBy keys on md5 (uniform, "
        "skew-proof however hot the boilerplate); the mark join is "
        "left unhinted so AQE broadcasts the (small) boilerplate tail; "
        "reassembly is one exchange on the unique doc id with an "
        "order-restoring array_sort — no window over the corpus."
    ),
    "source_capped_sample": (
        "Per-domain cap as the exact salted two-phase top-cap: phase 1 "
        "ranks inside (domain, salt) so a hot domain spreads over 32 "
        "tasks; phase 2 re-ranks ≤ cap·salts survivors per domain — "
        "the second `Window` sees KB, not the corpus. A naive single "
        "window would sort the whole hot domain in one task."
    ),
    "zorder_layout_stats": (
        "Z-order layout quality: two column-pruned scans (only the two "
        "layout dims leave the reader), a 1-row min/max reduction "
        "broadcast back (`BroadcastNestedLoopJoin` on a single row), "
        "the Morton interleave constant-folded into the scan-stage "
        "projection, and ONE exchange on the 64-key bucket id with "
        "map-side partials. The measurement costs two scans; the "
        "layout it certifies prunes every later 2-D range scan."
    ),
    "doc_pack_spans_strict": (
        "Strict packing: one window prefix-sum per source shard (the "
        "sessionization shuffle shape), then a map-only bounded "
        "explode (fan-out = total_tokens/512 rows). No global sort, "
        "no driver loop — the slice table streams out of the shuffle "
        "stage."
    ),
    "embedding_ann_ivf_sq8": (
        "The composed production index (IVF8,SQ8): centroid table and "
        "1-row quant stats both broadcast; the (id, cid, codes) table "
        "materializes as the stored index (1 byte/dim + a cell id per "
        "vector) and the dequantize+ADC scoring stage reads it — the "
        "same encode/score codegen split as `embedding_topk_quantized` "
        "(64 KB limit, r7). Probe join on cid; the quantization adds "
        "ZERO shuffles to the IVF skeleton."
    ),
    "embedding_ann_pq": (
        "Product quantization: 8 per-subspace training chains (each "
        "the portable-k-means shape) feed ONE union-exploded coding "
        "window keyed by the unique (id, subspace) pair — never m "
        "separate id-joins — then a groupBy-id reconstruction and the "
        "broadcast-query ADC scan. Training passes amortize across "
        "query batches in production; the codebook table (64 rows) "
        "broadcasts everywhere."
    ),
    "hilbert_layout_stats": (
        "Hilbert layout quality: identical skeleton to the z-order "
        "plan (two pruned scans, 1-row broadcast, one 64-key "
        "exchange), but the curve is 8 STAGED rotate/flip projections "
        "— the staging keeps plan growth linear in bits where a "
        "nested spelling is ~4^bits nodes. All map-only between the "
        "broadcast and the bucket agg."
    ),
    "doc_quality_classifier": (
        "Trained logistic classifier: each gradient-descent iteration "
        "is one map-only scoring pass against the broadcast 1-row "
        "weight table plus one global aggregate with DECIMAL partials "
        "— training state never exceeds (k+1) numbers and never "
        "touches the driver. Scoring is the same broadcast pattern, "
        "so inference composes into any scan stage."
    ),
    "scd2_user_history": (
        "SCD2 materialization: one lead() window per uniform user "
        "key — the sessionization exchange, one row of lookahead "
        "state. The output's (key, valid_from) pair is the natural "
        "z-order candidate for the 2-D as-of prune."
    ),
    "embedding_near_dup_lsh_portable": (
        "Hash-checkable LSH twin: Rademacher ±1 signatures are "
        "sequential folds (sign-exact on any engine), the self-join is "
        "an equality join on the bucket id — one uniform shuffle of "
        "the signature projection, pair expansion only within buckets, "
        "inline exact-cosine verify. The BLAS multi-table path keeps "
        "the discovery hot seat; this plan pins the per-table shape "
        "the oracle can see."
    ),
    "media_frame_fingerprints": (
        "Frame sampling as a partition-preserving `mapInPandas` with "
        "bounded fan-out (≤4 rows per item): no exchange anywhere — "
        "the stage inherits the scan's partitioning, so a 100 TB media "
        "table fans out to frames without a shuffle. The md5 "
        "fingerprints land under an EXACT oracle (every emitted byte "
        "re-derived in SQL)."
    ),
    "near_dup_components_star": (
        "Large-star/small-star components: each round is one "
        "groupBy-min over the adjacency plus one equality join — the "
        "same shapes as the propagation loop — but O(log² n) rounds on "
        "ANY graph, so a pathological near-dup chain cannot stall the "
        "job. Per-round `localCheckpoint` keeps the plan O(1) deep and "
        "exactly one edge table in executor storage."
    ),
    "embedding_ann_ivf_pq": (
        "Routed PQ (IVF8,PQ8 shape): coarse centroids and all 8 "
        "codebooks broadcast; coding is ONE posexplode + (id, "
        "subspace)-keyed window (the r7 keyed trainer — one plan for "
        "all subspaces, not 8 chains); the (id, cid, reconstruction) "
        "table materializes as the stored index and the probe join "
        "keys on cid. Zero extra shuffles over flat PQ."
    ),
    "embedding_knn_graph": (
        "Corpus k-NN graph: one cid-keyed exchange, then a grouped "
        "Arrow BLAS task per cell (FlatMapGroupsInPandas) — the "
        "quadratic is bounded to one cluster at a time, the "
        "semantic_dedup tractability argument, and the kernel "
        "hash-matches the SQL self-join twin."
    ),
    "dsir_resample": (
        "The DSIR keep step: the weight join is the DSIR plan "
        "(broadcast vocab counts, per-doc re-aggregation on the "
        "uniform id key); rate clamp and the portable-hash coin add "
        "one MAP-ONLY projection — the decision stage costs nothing "
        "at any corpus size."
    ),
    "doc_surprisal_band_fit": (
        "Percentile-fit gate: each band cut is max-over-a-TakeOrdered "
        "prefix (per-partition bounded heaps, no global sort), the "
        "1-row band broadcasts, and the verdict is a map-only "
        "projection over the persisted score table."
    ),
    "daily_ingest_keep_list": (
        "The daily incremental job end to end. Each stage keeps its "
        "standalone shape: map-only gates in the scan, one uniform "
        "fp-key window for batch dedup, LEFT ANTI against the (at "
        "scale, fp-bucketed) store, band-key equality join for "
        "near-dup discovery, Jaccard verify restricted to LSH "
        "survivors. Stages compose in pruning order so each shuffle "
        "sees less than the last."
    ),
    "embedding_ann_pq_sampled": (
        "IVF+PQ with every trainer sampled (r8): the coarse quantizer "
        "and all 8 subspace codebooks train on the TakeOrdered / "
        "per-key-ranked smallest-hash prefix — constant-size training "
        "inputs regardless of corpus size — while coding, routing, and "
        "ADC keep the full-corpus embedding_ann_ivf_pq shape. The last "
        "full-scan trainer in the index family is gone."
    ),
    "embedding_ann_lsh": (
        "Multiprobe hyperplane-LSH top-k: the corpus buckets once on "
        "the (portable, sign-exact) signature; queries explode to 9 "
        "probe buckets and BROADCAST, so the candidate join is an "
        "equality join on the bucket id — never a cross join — and "
        "scoring touches ~N/2^m (+probes) vectors per query."
    ),
    "source_temperature_sample": (
        "sqrt-temperature mixing (r8): one map-side-partial count on "
        "the tiny source keyspace, quota table BROADCAST back, then "
        "the exact salted two-phase per-key rank (a hot source spreads "
        "over 32 salt tasks; phase 2 is bounded by quota*n_salts rows "
        "per key, never the corpus)."
    ),
    "doc_training_order": (
        "Deterministic training-order shuffle (r8): shard key is a "
        "uniform hash residue, so the single exchange is balanced by "
        "construction; position is a per-shard window rank — no global "
        "sort ever materializes, and n_shards is the task-size knob."
    ),
    "simhash_near_pairs_portable": (
        "Full-pipeline portable simhash discovery (r8): one uniform "
        "block-key shuffle, per-block pair expansion bounded by the "
        "1000-cap, bit_count hamming verify inline — the production "
        "xxhash path's exact plan shape, now under hash evidence."
    ),
    "minhash_lsh_pairs_portable": (
        "Full-pipeline portable banded LSH (r8): (band, bkey) "
        "equality self-join with the hot-bucket cap, distinct "
        "pair-key reduction, then the signature-agreement count on "
        "uniform pair keys — the minhash_lsh_pairs shape end to end."
    ),
    "decontamination_scrub": (
        "Span-level decontamination (r8): eval-gram fingerprints "
        "broadcast (benchmarks are MBs vs a 100 TB corpus), the train "
        "side segments map-only inside the scan (non-overlapping — "
        "expansion 1x), and the only data shuffle is the uniform "
        "doc-id reassembly — the duplicated_segment_scrub shape with "
        "the dup set swapped for the broadcast eval set."
    ),
    "source_epoch_allocation": (
        "Epoch water-fill (r8): one map-side-partial aggregation onto "
        "the tiny source keyspace, then window totals over the "
        "|sources|-row frame — nothing returns to the corpus; the "
        "whole plan is dimension-table-sized past the first agg."
    ),
    "embedding_ann_ivf_incremental": (
        "Incremental IVF ingest (r8): training reads ONLY the store "
        "subset (filter pushed to the scan), the full union assigns "
        "against broadcast store-trained centroids via the max_by "
        "hash-aggregate (no retraining, no sort), probing unchanged. "
        "At scale the daily batch is the only new work — assignment "
        "is one broadcast map pass over the batch."
    ),
    "doc_surprisal_band_stratified": (
        "Per-source percentile gate (r8): the unigram-surprisal score "
        "plan, one id-keyed join to recover the source, then ONE "
        "source-keyed exchange where rank, count, and both "
        "conditional-max band cuts ride the same Window sort. Exact "
        "per-stratum order statistics need the total per-stratum "
        "order; at 100 TB shard by (stratum, score-range) or use the "
        "corpus-wide TakeOrdered variant."
    ),
    "corpus_vocabulary": (
        "Vocab build (r10): ONE tokenize+count corpus pass into a "
        "persisted vocab-sized table; both the top-200 heap "
        "(`TakeOrderedAndProject`) and the corpus total read the cache "
        "(`InMemoryTableScan` ×2). The 1-row total broadcasts; the "
        "rank/cumsum Window sees 200 rows. Coverage is DECIMAL(38) "
        "exact-multiple floor division — cum·1e6 overflows int64 at "
        "~9e12 tokens, i.e. at exactly the corpus size this engine "
        "targets."
    ),
    "bpe_pair_counts": (
        "BPE first-merge statistics (r10): the pair Generate sits ABOVE "
        "the word-count aggregate — pair explosion runs over the "
        "DISTINCT vocabulary weighted by counts (vocab-bounded, ~1e7 "
        "rows at web scale), never the ~1e14 corpus token occurrences. "
        "Exactly two aggregation exchanges (word counts, pair counts); "
        "top-50 is a bounded heap."
    ),
    "source_minhash_overlap": (
        "Cross-source overlap from MERGED sketches (r10): per-doc "
        "portable signatures partial-aggregate map-side onto "
        "(source, i) — min-fold is associative, so the source signature "
        "is exactly the signature of its shingle union — and the "
        "pairwise Jaccard stage runs on the persisted |sources|-row "
        "table (`InMemoryTableScan` on both join sides, broadcast "
        "inequality join). The quadratic cross-source document join "
        "this replaces would be the single worst plan at 100 TB."
    ),
    "source_quality_drift": (
        "Ingest drift monitor (r10): one corpus pass partial-aggregating "
        "to (source, token-bin) cells; totals and the TV-distance "
        "aggregation run on |sources|·16 rows with broadcast totals. "
        "All fixed-point DECIMAL(38) arithmetic; the half split hashes "
        "ids with the portable permutation (raw parity is degenerate "
        "under block-allocated id ranges)."
    ),
    "props_key_profile": (
        "CDC payload schema observation (r10): `json_object_keys` "
        "explodes inside codegen (map-only), both aggs partial-combine "
        "map-side, per-type totals broadcast. At 100 TB of events this "
        "is one shuffle of (type, key) partial counts — the emergent "
        "payload schema for the price of a word count."
    ),
    "bpe_merge_steps": (
        "BPE merge-table training (r11): the registered plan is a flat "
        "Union over 8 per-step `Scan ExistingRDD` nodes — each training "
        "step is a LAZY localCheckpoint, truncating lineage so the plan "
        "does not nest 2^8 copies of the history (a bare persist leaves "
        "256 parquet-scan mentions and a recompute race between union "
        "branches). Inside a step (see test_plans.py's checkpoint=False "
        "probe): pair counts partial-aggregate map-side over the "
        "vocab-sized frame, the argmax is `TakeOrderedAndProject`, and "
        "the 1-row winner re-enters as a BROADCAST so the merge replace "
        "is map-only. The corpus is scanned exactly once, into the "
        "step-0 vocabulary."
    ),
    "bpe_compression_by_source": (
        "Trained-vocab application (r11): NO second corpus text pass — "
        "the corpus collapses once to (source, word) occurrence counts "
        "(uniform keys, map-side partials), LEFT-joins the final "
        "vocabulary's per-word symbol counts (both sides vocab-sized), "
        "and aggregates to |sources| rows. Ratio in DECIMAL(38) "
        "exact-multiple floor micros."
    ),
    "bpe_token_frequencies": (
        "Post-merge token frequencies (r11): one explode of the FINAL "
        "trained vocabulary (vocab-sized, never corpus-sized) weighted "
        "by word counts, unioned with a map-only single-char word "
        "count, aggregated on the tiny symbol domain. The corpus is "
        "scanned twice (trainer vocab + short words) but never "
        "re-paired."
    ),
    "customer_order_distribution": (
        "TPC-H Q13 shape (r11): orders pre-aggregates to per-customer "
        "counts BEFORE the outer join (map-side partial counts, one "
        "uniform-key shuffle) — never join-then-count, which would "
        "shuffle every order row through the join. The outer join "
        "fills the zero bucket via coalesce; the second aggregate is "
        "over the tiny k-domain. ReadSchema on orders is 2 columns."
    ),
    "small_quantity_revenue": (
        "TPC-H Q17 shape (r11): the correlated per-part mean "
        "de-correlates into aggregate-then-rejoin; the brand key set "
        "broadcasts as a semi-filter FIRST so the average runs only "
        "over the ~1/|brands| matching slice, and the per-part limits "
        "rejoin on the same uniform partkey."
    ),
    "disjunctive_part_revenue": (
        "TPC-H Q19 shape (r11): the cross-side disjunction's per-side "
        "implications are factored below the join — the plan test "
        "pins the Or(...) predicate INSIDE both parquet scans' "
        "PushedFilters — so the broadcast build side is three brands' "
        "slices, not the whole part table."
    ),
    "sole_late_suppliers": (
        "TPC-H Q21 shape (r11): EXISTS -> LeftSemi, NOT EXISTS -> "
        "LeftAnti, each an orderkey equi-join carrying the suppkey "
        "inequality as a residual condition (never a cartesian). The "
        "~1% late slice feeds BOTH quantifiers and Spark does not "
        "dedup the branches into one exchange, so it is a lazy "
        "localCheckpoint: lineitem⨝orders runs once."
    ),
    "dormant_customer_balances": (
        "TPC-H Q22 shape (r11): the 1-row (sum, count) threshold "
        "broadcasts as a nested-loop scalar join and the balance "
        "comparison cross-multiplies DECIMALs (never a double average "
        "— rounding could flip boundary rows between engines); the "
        "NOT EXISTS is a custkey LeftAnti with the recency predicate "
        "pushed to the orders scan."
    ),
    "nation_trade_volume": (
        "TPC-H Q7 shape (r11): supplier and the two nation sides "
        "broadcast with the nation-name In-filter pushed to the scan, "
        "so lineitem shrinks ~|nations|-fold at its FIRST join, "
        "before the only two big shuffles (orderkey, custkey). The "
        "either-direction pair disjunction filters post-join."
    ),
    "top_revenue_suppliers": (
        "TPC-H Q15 shape (r11): the quarter filter pushes to the "
        "lineitem scan; the per-supplier DECIMAL revenue frame is a "
        "lazy localCheckpoint consumed by both the scalar max and the "
        "equality join (Spark does not canonicalize the branches into "
        "a reused exchange — verified at runtime), so the quarter "
        "slice is scanned and shuffled exactly once; the 1-row max "
        "and dim-sized supplier broadcast."
    ),
    "orders_table_profile": (
        "Whole-table profile (r11): every column's nulls/distincts/"
        "typed min-max in ONE scan — the multi-distinct aggregate "
        "plans via Expand (row fans out once per distinct column, "
        "partial dedup map-side), then a 1-row-to-6-row stack "
        "projection. The naive per-column union would scan 6×; at "
        "petabyte scale swap exact count_distinct for "
        "approx_count_distinct (HLL, no Expand)."
    ),
    "event_funnel_counts": (
        "Ordered funnel (r11): each stage filters events to one type "
        "at the scan, reduces to a user-sized min, and joins the "
        "previous stage on the SAME uniform user key — frames only "
        "shrink down the funnel; no windows, no per-user sorts. "
        "Timestamps compare as integer epoch-µs."
    ),
    "weekly_retention_cohorts": (
        "Retention triangle (r11): first-event frame is one user-keyed "
        "shuffle with map-side partial mins, rejoined on the same key; "
        "the distinct count is the standard two-phase partial-dedup. "
        "Week math is integer µs floor division — no engine-specific "
        "calendar-week truncation."
    ),
    "large_quantity_orders": (
        "TPC-H Q18 shape (r10): the over-threshold key set reduces via "
        "map-side partial DECIMAL sums, then BROADCASTS into a LeftSemi "
        "against the lineitem re-read — the detail never shuffles on "
        "the full key space; orders/customer join broadcast onto the "
        "shrunken fact. Exactly two aggregation exchanges."
    ),
}


def main() -> None:
    spark = get_spark("plans", cpus=8)
    out = [
        "# PLANS — physical plans of the headline queries\n",
        "Generated by `tools/explain_plans.py` (sf0.1 inputs; regenerate "
        "after plan-affecting changes). `tests/test_plans.py` asserts the "
        "load-bearing properties of these plans so regressions fail CI, "
        "not the cluster.\n",
    ]
    for name, comment in COMMENTARY.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        # keep the tree + the scan/exchange/agg details; full dumps are long
        out.append(f"## {name}\n\n{comment}\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
