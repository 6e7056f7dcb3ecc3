"""Semantics tests for the non-SQL-expressible pipeline operators
(MinHash LSH, SimHash, hyperplane ANN, multimodal decode) — the ops
whose hash-seed math has no portable DuckDB oracle, verified instead
against exact formulations on the same fixture data.

Recall targets are on the sf0.001 documents/embeddings fixtures
(deterministic: driver-generated parquet + fixed hash seeds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators import dedup as D
from pg2kafka_spark.operators import multimodal as M
from pg2kafka_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# MinHash + LSH vs exact shingle Jaccard
# ---------------------------------------------------------------------------


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, "documents", SF_DIR)
    exact = {
        (r.id_a, r.id_b)
        for r in D.jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs).collect()
    }
    # 16 bands x 4 rows: P(catch | j=0.5) = 1-(1-0.5^4)^16 ~ .645/pair-band,
    # but near-dup fixture pairs sit well above 0.5 -> expect high recall.
    if exact:
        recall = len(exact & cand) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(exact)} exact pairs"


def test_minhash_estimate_tracks_exact_jaccard(spark):
    docs = load_table(spark, "documents", SF_DIR)
    exact = D.jaccard_pairs(docs, threshold=0.3).select("id_a", "id_b", "jaccard")
    est = D.minhash_lsh_pairs(docs).select("id_a", "id_b", "est_jaccard")
    joined = exact.join(est, ["id_a", "id_b"]).collect()
    assert joined, "no overlapping pairs to compare"
    for r in joined:
        # 64 hashes -> stderr ~ sqrt(j(1-j)/64) <= 0.0625; allow 4 sigma.
        assert abs(r.jaccard - r.est_jaccard) < 0.3, (
            f"pair ({r.id_a},{r.id_b}): exact={r.jaccard:.3f} est={r.est_jaccard:.3f}"
        )


def test_simhash_pairs_are_textually_similar(spark):
    docs = load_table(spark, "documents", SF_DIR)
    pairs = D.simhash_near_pairs(docs, max_hamming=3)
    exact = D.jaccard_pairs(docs, threshold=0.0).select("id_a", "id_b", "jaccard")
    joined = pairs.join(exact, ["id_a", "id_b"], "left").collect()
    for r in joined:
        # hamming <= 3 of 64 bits -> cosine of term vectors ~ cos(3pi/64) >= .98;
        # token-shingle jaccard of such pairs should be clearly nonzero.
        assert r.jaccard is not None and r.jaccard > 0.2, (
            f"simhash pair ({r.id_a},{r.id_b}) looks dissimilar (jaccard={r.jaccard})"
        )


def test_exact_dedup_keeps_lowest_id(spark):
    docs = load_table(spark, "documents", SF_DIR)
    deduped = D.exact_dedup(docs)
    # one row per fingerprint, and each kept id is the group min
    from pg2kafka_spark.operators.text import fingerprint

    groups = docs.groupBy(fingerprint(F.col("text")).alias("fp")).agg(
        F.min("doc_id").alias("min_id")
    )
    kept = deduped.select(
        fingerprint(F.col("text")).alias("fp"), F.col("doc_id")
    )
    bad = kept.join(groups, "fp").filter(F.col("doc_id") != F.col("min_id")).count()
    assert bad == 0
    assert deduped.count() == groups.count()


# ---------------------------------------------------------------------------
# ANN: hyperplane LSH vs brute force
# ---------------------------------------------------------------------------


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = S.brute_force_topk(emb, queries, k=5).collect()
    approx = S.lsh_bucket_topk(emb, queries, k=5).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets: dict[int, set] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    # 8-bit buckets + 1-bit multiprobe on 64-dim synthetic vectors:
    # neighbor buckets differ in ~0-1 bits for high-cos pairs.
    assert recall >= 0.5, f"ANN recall@5 = {recall:.2f}"


def test_brute_force_topk_is_exact_and_ranked(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = S.brute_force_topk(emb, queries, k=10).orderBy("rank").collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id != 0 for r in rows)
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def test_decode_media_deterministic_schema_and_values(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(50)
    media = M.synth_media(docs)
    f1 = M.decode_media(media, mode="fake")
    assert [f.name for f in f1.schema.fields] == [
        "media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "feature",
    ]
    rows1 = {r.media_id: r for r in f1.collect()}
    rows2 = {r.media_id: r for r in M.decode_media(media, mode="fake").collect()}
    assert rows1.keys() == rows2.keys()
    for mid, r in rows1.items():
        assert r.feature == rows2[mid].feature  # same bytes -> same features
        assert len(r.feature) == M.FEATURE_DIM
        if r.media_type == "image":
            assert r.width is not None and r.height is not None
            assert r.duration_ms is None
        else:
            assert r.duration_ms is not None
            assert r.width is None


def test_decode_media_real_mode_is_stubbed(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(5)
    media = M.synth_media(docs)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        M.decode_media(media, mode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_media_rejects_unknown_mode(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(1)
    with pytest.raises(ValueError):
        M.decode_media(M.synth_media(docs), mode="nope")
