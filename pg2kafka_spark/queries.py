"""Query registry — every operator from SURVEY.md §2 (+ M3/M5 extras)
exposed as a (spark, sf_dir) → DataFrame callable with, where
SQL-expressible, a DuckDB oracle string.

Thin aggregator: the registry lives in ``qreg``; query definitions in
``q_cdc`` (CDC core), ``q_relational`` (batch consumer surface),
``q_pipeline`` (dedup / similarity / text-analysis extras). Importing
this module registers everything.
"""

from __future__ import annotations

from pg2kafka_spark.qreg import ORACLES, QUERIES, QueryFn, query

# Importing for registration side effects. Order matters for
# evidence coverage: the driver's correctness artifact records the
# first 50 registered queries, so coverage ROTATES across rounds
# (per round-5 verdict/advice): r5 put q_pipeline first; r6 rotated
# q_cdc + q_relational to the front; r7 rotated q_pipeline first
# again (CORRECTNESS_r07: all 50 green); r8 rotates q_cdc +
# q_relational back to the front per the r7 verdict — the CDC core
# (SURVEY §2's actual operator inventory) and the relational consumer
# surface last saw driver rows in r6, and two rounds of drift is the
# limit. Whatever falls outside the window is always covered by the
# committed full-surface CORRECTNESS_LOCAL artifact regenerated every
# round. r8+r9 ran the CDC/relational-fronted window (all green);
# r10 rotates q_pipeline back to the front. r11 NOTE: rotate q_cdc +
# q_relational to the front again, and keep alternating each round.
from pg2kafka_spark import q_pipeline as _q_pipeline  # noqa: F401

from pg2kafka_spark import q_cdc as _q_cdc  # noqa: F401
from pg2kafka_spark import q_relational as _q_relational  # noqa: F401


# Window shaping history: the driver hash-checks only the FIRST 50
# registered entries, so coverage rotates across rounds (standing
# alternation since r5; whatever falls outside the window is always
# covered by the committed full-surface CORRECTNESS_LOCAL artifact
# regenerated at round close). r10 + r12 + r14 + r16 + r18 ran
# pipeline-fronted windows; r11 + r13 + r15 + r17 + r19 ran CDC +
# relational (all green). r20 (this round) rotates PIPELINE back to
# the front per the r19 verdict's item 1: the round-19 optimization
# work rewrote the ANN/k-means assignment, the IVF-PQ index build,
# the surprisal scalars, the table profiler and the iterative-graph
# persists, and the CDC/relational-fronted r19 window meant NONE of
# those queries took an r19 driver-oracle row (they are covered by
# the committed CORRECTNESS_LOCAL_r19 + CORRECTNESS_LOCAL_SF01_r19
# full-surface sweeps). Order:
#   (0) queries whose FORMULA/PLAN CHANGED in r19 or r20 without a
#       fresh driver row for the changed code (the verdict's tier-0
#       mandate: the whole map-only-argmax ANN family, the served
#       IVF twins, the LSH portable twin, the surprisal pair, the
#       split-aggregate table profile, the persist-backed graph
#       consumers) — plus anything r20 touches, appended as changed,
#   (1) pipeline oracle-backed with no r18 driver row (last driver
#       row r14 — stalest; the four _R20_FRONT names seeded by r19
#       first),
#   (2) pipeline oracle-backed with an r18 driver row, registry
#       order,
#   (3) CDC/relational oracle-backed (all hold r17/r19 rows; the
#       r19 window just re-verified 50 of them), registry order,
#   (4) rows-only queries last (their portable twins are
#       oracle-backed).
# r21 NOTE: rotate CDC/relational back to the front; keep
# alternating, and keep tier 0 = new/changed-this-round.
_FRONT: list[str] = [
    # r19 map-only-argmax ANN family (similarity.py change 1) — the
    # round's biggest semantic surgery, driver-oracle row pending
    "embedding_ann_ivf", "embedding_ann_ivf_sq8",
    "embedding_ann_ivf_pq", "embedding_ann_pq",
    "embedding_ann_pq_sampled", "embedding_ann_ivf_sampled",
    "embedding_ann_ivf_incremental", "embedding_prototype_prune",
    "embedding_diversity_sample", "semantic_dedup_embeddings",
    "embedding_cell_drift", "embedding_knn_graph",
    "embedding_topk_quantized",
    # r19 fused IVF-PQ index build + map-only serve (index_store.py)
    "ann_ivf_served_incremental", "ann_ivf_pq_served_incremental",
    # r19 LSH super-grouping landed in embedding_near_dup_lsh (rows
    # only); its oracle-checkable portable twin takes the window row
    "embedding_near_dup_lsh_portable",
    # r19 surprisal scalar derivation (text.py change 6)
    "doc_unigram_surprisal", "doc_bigram_surprisal",
    # r19 split string-min/max table profile (profile.py change 5)
    "orders_table_profile",
    # r19 iterative-graph persist/checkpoint consumers (graph.py
    # change 3)
    "nation_trade_pagerank", "nation_trade_pagerank_conserving",
    "near_dup_components", "near_dup_components_star",
    "near_dup_canonical", "near_dup_components_incremental",
    "near_dup_components_served",
]
# stale pipeline names seeded by r19 for this rotation (last driver
# row r14; embedding_cell_drift from the original seed is already in
# tier 0 above)
_R20_FRONT = [
    "simhash_portable", "simhash_near_pairs_portable",
    "minhash_lsh_pairs_portable",
]
# names that took a fresh r18 driver row (CORRECTNESS_r18.json keys) —
# the pipeline/serve/graph/BPE window
_R18_WINDOW = {
    "ann_ivf_pq_served_incremental", "ann_ivf_served_incremental",
    "bpe_compression_by_source", "bpe_encode_documents",
    "bpe_encode_production", "bpe_merge_steps", "bpe_pair_counts",
    "bpe_token_frequencies", "decontamination_check",
    "doc_char_ngram_stats", "doc_chunk_windows", "doc_duplicate_ngrams",
    "doc_pack_assignments", "doc_pii_scrub", "doc_quality_extended",
    "doc_repetition", "doc_rolling_hash", "doc_stratified_sample",
    "doc_train_val_test_split", "doc_unigram_surprisal",
    "embedding_ann_ivf", "embedding_ann_lsh",
    "embedding_diversity_sample", "embedding_near_dup_lsh_portable",
    "embedding_near_dup_pairs", "embedding_topk",
    "embedding_topk_quantized", "incremental_dedup_batch",
    "lang_ngram_profile", "leakage_free_split",
    "media_frame_fingerprints", "media_frame_sample",
    "media_near_dup_by_frames", "media_near_dup_real",
    "multimodal_decode_parity", "multimodal_features",
    "multimodal_features_real", "nation_trade_pagerank",
    "nation_trade_pagerank_conserving", "near_dup_canonical",
    "near_dup_components", "near_dup_components_incremental",
    "near_dup_components_served", "near_dup_components_star",
    "near_dup_keep_list", "semantic_dedup_embeddings",
    "source_mix_rebalance", "tfidf_top_terms",
    "weekly_retention_served", "weekly_retention_served_cohort_window",
}
# (The r17 CDC/relational window set that earlier rotations keyed on
# is gone: every CDC/relational oracle-backed name now holds an r17,
# r19 or both driver rows, so they share one tier. r21's rotation
# should key CDC/rel staleness on CORRECTNESS_r19.json's keys.)
from pg2kafka_spark.q_cdc import __name__ as _qcdc_mod  # noqa: E402
from pg2kafka_spark.q_relational import (  # noqa: E402
    __name__ as _qrel_mod,
)

_reg_pos = {n: i for i, n in enumerate(QUERIES)}
_cdc_rel_names = {
    n for n, fn in QUERIES.items()
    if getattr(fn, "__module__", "") in (_qcdc_mod, _qrel_mod)
}


def _tier(n: str) -> tuple:
    if n in _FRONT:
        return (0, _FRONT.index(n))
    if n not in ORACLES:
        return (5, _reg_pos[n])
    if n in _cdc_rel_names:
        return (4, _reg_pos[n])
    if n not in _R18_WINDOW:
        # stale pipeline — last driver row r14; seeded names first
        if n in _R20_FRONT:
            return (1, -len(_R20_FRONT) + _R20_FRONT.index(n))
        return (1, _reg_pos[n])
    return (3, _reg_pos[n])


_ordered = sorted(QUERIES, key=_tier)
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "ORACLES", "QueryFn", "query"]
