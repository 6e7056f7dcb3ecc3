"""Training-set assembly operators (operators/assembly.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2kafka_spark.operators.assembly import assign_packs, stratified_hash_sample


def test_assign_packs_continuous_fill(spark):
    docs = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 50), ("a", 3, 10), ("a", 4, 100), ("b", 1, 250)],
        "source string, doc_id long, n_tokens long",
    )
    got = {
        (r["source"], r["doc_id"]): r["pack_id"]
        for r in assign_packs(
            docs, "n_tokens", "doc_id", ["source"], budget=100
        ).collect()
    }
    # a: offsets 0, 60, 110, 120 -> packs 0, 0, 1, 1; b restarts at 0
    assert got == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 1, ("b", 1): 0}


def test_assign_packs_offsets_stay_in_pack_window(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", F.lit(1).alias("one"))
        .withColumn("n_tokens", F.col("doc_id") % 7 + 1)
        .drop("one")
    )
    packed = assign_packs(docs, "n_tokens", "doc_id", ["source"], budget=50)
    # invariant: a doc's exclusive start offset lies inside its pack
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bad = (
        packed.withColumn("off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(
            (F.col("off") < F.col("pack_id") * 50)
            | (F.col("off") >= (F.col("pack_id") + 1) * 50)
        )
        .count()
    )
    assert bad == 0


def test_stratified_sample_is_deterministic_and_respects_rates(spark):
    rows = [(i, "en" if i % 3 else "de", f"tok{i} tok{i+1} tok{i*7%13}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    # RAW signed xxhash64 — the natural input. Half its values are
    # negative; pmod must still land every bucket in [0, 100). (The
    # pre-pmod version needed F.abs here and silently kept ~50% of
    # every stratum without it.)
    h = F.xxhash64("text")
    a = stratified_hash_sample(docs, "lang", h, {"en": 10}, default_rate=90)
    b = stratified_hash_sample(docs, "lang", h, {"en": 10}, default_rate=90)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    kept = a.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    # de kept at ~90%, en at ~10% — loose bounds, exactness is the
    # oracle's job; this guards the rate wiring (per-stratum CASE)
    assert by_lang.get("de", 0) > by_lang.get("en", 0)
    # en is 2/3 of the corpus but sampled at 10%: a signed-bucket
    # keep-everything regression would invert this
    assert by_lang.get("en", 0) < 0.2 * 200
    # buckets actually bounded below and above by the stratum rate
    assert a.filter(F.col("bucket") < 0).count() == 0
    assert a.filter((F.col("lang") == "en") & (F.col("bucket") >= 10)).count() == 0
    assert a.filter(F.col("bucket") >= 90).count() == 0


def test_mix_rebalance_downsamples_to_uniform_quota(spark):
    from pg2kafka_spark.operators.assembly import mix_rebalance

    # 300 docs from 'web', 60 from 'books', 40 from 'code': total 400,
    # 3 strata -> quota 133 each. web gets rate 133*1e6//300 = 443333
    # ppm; the small strata exceed no quota and keep everything.
    rows = (
        [(i, "web") for i in range(300)]
        + [(1000 + i, "books") for i in range(60)]
        + [(2000 + i, "code") for i in range(40)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_rebalance(docs, strata_col="source").cache()
    rates = {
        r["source"]: r["rate_ppm"]
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    assert rates == {"web": 443333, "books": 1_000_000, "code": 1_000_000}
    kept = {
        r["source"]: r["n"]
        for r in out.filter("kept").groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # every under-quota stratum survives whole; the hash keeps web
    # within a loose band of its 133-doc quota (deterministic, so the
    # exact count is stable run to run)
    assert kept["books"] == 60 and kept["code"] == 40
    assert 100 <= kept["web"] <= 166
    # determinism: same input -> identical keep set
    again = mix_rebalance(docs, strata_col="source")
    assert sorted(
        r["doc_id"] for r in again.filter("kept").collect()
    ) == sorted(r["doc_id"] for r in out.filter("kept").collect())
    out.unpersist()


def test_mix_rebalance_rate_table_broadcasts(spark):
    from pg2kafka_spark.operators.assembly import mix_rebalance

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(50)], "doc_id long, source string"
    )
    plan = mix_rebalance(docs, strata_col="source")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_train_val_test_split_bands_and_determinism(spark):
    from pg2kafka_spark.operators.assembly import train_val_test_split

    docs = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = train_val_test_split(docs)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # mixer-driven bands: proportions converge to 900/50/50 per mille
    assert abs(counts["train"] - 9000) < 300
    assert abs(counts["val"] - 500) < 120
    assert abs(counts["test"] - 500) < 120
    # bucket ↔ split consistency and rerun determinism
    bad = out.filter(
        ((F.col("split_bucket") < 900) & (F.col("split") != "train"))
        | ((F.col("split_bucket") >= 950) & (F.col("split") != "test"))
    ).count()
    assert bad == 0
    again = {r["doc_id"]: r["split"] for r in train_val_test_split(docs).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_strict_pack_spans_reconstruct_and_fill(spark):
    from pg2kafka_spark.operators.assembly import strict_pack_spans

    rows = [
        ("a", 1, 3),
        ("a", 2, 10),  # straddles: fills pack 0 (5 left? see budget)
        ("a", 3, 2),
        ("b", 7, 4),
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
    out = strict_pack_spans(
        df, token_col="n_tokens", order_col="doc_id",
        partition_cols=["source"], budget=8,
    ).collect()
    # spans per doc sum to the doc's tokens, contiguous from 0
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r["pack_id"])
        n = [x[2] for x in rows if x[1] == doc_id][0]
        assert sum(s["span_tokens"] for s in spans) == n
        assert spans[0]["doc_tok_start"] == 0
        for prev, cur in zip(spans, spans[1:]):
            assert (
                prev["doc_tok_start"] + prev["span_tokens"]
                == cur["doc_tok_start"]
            )
    # every pack except each partition's last is exactly full
    by_pack = {}
    for r in out:
        key = (r["source"], r["pack_id"])
        by_pack[key] = by_pack.get(key, 0) + r["span_tokens"]
    for src in {s for s, _ in by_pack}:
        packs = sorted(p for s, p in by_pack if s == src)
        for p in packs[:-1]:
            assert by_pack[(src, p)] == 8, (src, p, by_pack)
    # doc 2 (10 tokens after 3) spans packs 0 and 1 of source a
    assert [r["pack_id"] for r in sorted(by_doc[2], key=lambda r: r["pack_id"])] == [0, 1]
    # pack-relative offsets are consistent: start + preceding spans align
    for r in out:
        assert 0 <= r["pack_tok_start"] < 8
        assert r["pack_tok_start"] + r["span_tokens"] <= 8


def test_strict_pack_spans_invariants_fuzz(spark):
    """Property fuzz over random shard layouts: for ANY token-count
    sequence, (1) per-doc spans reconstruct the doc contiguously,
    (2) every non-final pack is exactly full, (3) pack offsets are
    in-range, (4) total span mass equals total tokens."""
    from hypothesis import given, settings, strategies as st

    from pg2kafka_spark.operators.assembly import strict_pack_spans

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["s1", "s2"]),
                st.integers(min_value=0, max_value=40),
            ),
            min_size=1,
            max_size=12,
        ),
        st.integers(min_value=1, max_value=16),
    )
    def check(items, budget):
        rows = [
            (src, i, n) for i, (src, n) in enumerate(items)
        ]
        df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
        out = strict_pack_spans(
            df, token_col="n_tokens", order_col="doc_id",
            partition_cols=["source"], budget=budget,
        ).collect()
        total = sum(n for _, _, n in rows)
        assert sum(r["span_tokens"] for r in out) == total
        by_doc = {}
        by_pack = {}
        for r in out:
            assert r["span_tokens"] >= 1
            assert 0 <= r["pack_tok_start"] < budget
            assert r["pack_tok_start"] + r["span_tokens"] <= budget
            by_doc.setdefault(r["doc_id"], []).append(r)
            key = (r["source"], r["pack_id"])
            by_pack[key] = by_pack.get(key, 0) + r["span_tokens"]
        for doc_id, spans in by_doc.items():
            spans.sort(key=lambda r: r["pack_id"])
            n = dict((i, t) for _, i, t in rows)[doc_id]
            assert sum(s["span_tokens"] for s in spans) == n
            assert spans[0]["doc_tok_start"] == 0
            for a, b in zip(spans, spans[1:]):
                assert a["doc_tok_start"] + a["span_tokens"] == b["doc_tok_start"]
                assert b["pack_id"] == a["pack_id"] + 1
        for src in {s for s, _ in by_pack}:
            packs = sorted(p for s, p in by_pack if s == src)
            for p in packs[:-1]:
                assert by_pack[(src, p)] == budget

    check()


def test_weighted_sample_prefers_heavier_rows(spark):
    """Proportional selection, measured: with ids 0..1999 and weight
    10 for the first half vs 1 for the second, the 200-row sample
    must be dominated by heavy rows (E[heavy] ≈ 0.9·200), and the
    sample must be the exact deterministic top-n by (key, id)."""
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.assembly import weighted_sample_topn

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit(10)).otherwise(F.lit(1)).alias("w"),
    )
    got = weighted_sample_topn(df, F.col("w"), n=200).collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["doc_id"] < 1000)
    assert heavy >= 150, heavy  # E≈180; far above the uniform 100
    # determinism: rerun yields the identical sample
    again = weighted_sample_topn(df, F.col("w"), n=200).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in again]


def test_weighted_sample_id_zero_not_privileged(spark):
    """r7 verdict edge: without the additive pre-salt, ``doc_id = 0``
    (and any id ≡ 0 mod 2³¹−1) hashed to key 0 and was ALWAYS sampled
    regardless of weight. With the salt, a weight-1 id-0 row must lose
    to 999 weight-1000 rows (its key ≈ 1.46e9 vs their ≤ 2.1e6), and
    the whole sample must equal an independent pure-Python replay of
    the key formula."""
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.assembly import weighted_sample_topn
    from pg2kafka_spark.operators.similarity import (
        PORTABLE_SAMPLE_MOD,
        PORTABLE_SAMPLE_OFFSET,
        PORTABLE_SAMPLE_SALT,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit(1)).otherwise(F.lit(1000)).alias("w"),
    )
    got = [r["doc_id"] for r in weighted_sample_topn(df, F.col("w"), n=100).collect()]
    assert 0 not in got

    def key(i, w):
        h = (
            (i % PORTABLE_SAMPLE_MOD + PORTABLE_SAMPLE_OFFSET)
            * PORTABLE_SAMPLE_SALT
        ) % PORTABLE_SAMPLE_MOD
        return h // w

    ref = sorted(range(1000), key=lambda i: (key(i, 1 if i == 0 else 1000), i))
    assert got == ref[:100]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.assembly import weighted_sample_topn

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5, F.lit(0)).otherwise(F.lit(3)).alias("w"),
    )
    got = {r["doc_id"] for r in weighted_sample_topn(df, F.col("w"), n=10).collect()}
    assert got == set(range(5, 10))


def test_temperature_sample_boosts_tail_sources(spark):
    """sqrt-temperature property: with sources of 900 and 100 docs and
    a 100-row budget, proportional sampling gives the tail 10 rows;
    sqrt smoothing must give it 100*sqrt(100)/(sqrt(900)+sqrt(100)) =
    25. Quotas are integer-exact and the kept rows are the smallest
    portable-hash prefix per source (determinism re-checked)."""
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.assembly import temperature_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, F.lit("big")).otherwise(F.lit("small")).alias(
            "source"
        ),
    )
    got = temperature_sample(df, "source", target_rows=100).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    # w_big = floor(30*1e6), w_small = floor(10*1e6): quotas 75 / 25
    assert len(by_src["big"]) == 75
    assert len(by_src["small"]) == 25
    assert all(r["quota"] == 75 and r["n_stratum"] == 900 for r in by_src["big"])
    assert all(r["quota"] == 25 and r["n_stratum"] == 100 for r in by_src["small"])
    # ranks are 1..quota with no gaps
    for rows in by_src.values():
        assert sorted(r["key_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
    again = temperature_sample(df, "source", target_rows=100).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)


def test_training_order_assign_covers_balanced_deterministic(spark):
    """Every row gets exactly one (shard, position); positions are
    1..n per shard with no gaps; hash sharding is near-balanced; the
    order decorrelates from the id order (a prefix of ids does NOT
    map to a prefix of any shard); reruns are identical."""
    from pyspark.sql import functions as F

    from pg2kafka_spark.operators.assembly import training_order_assign

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    got = training_order_assign(df, n_shards=8).collect()
    assert len(got) == 4000 and len({r["doc_id"] for r in got}) == 4000
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(8))
    for rows in by_shard.values():
        assert sorted(r["position"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
        # uniform hash residues: each shard within ±30% of 500
        assert 350 <= len(rows) <= 650
    # decorrelation: the first 100 positions of shard 0 are not the
    # 100 smallest doc_ids in shard 0's id order
    s0 = sorted(by_shard[0], key=lambda r: r["position"])[:100]
    assert [r["doc_id"] for r in s0] != sorted(r["doc_id"] for r in s0)
    again = training_order_assign(df, n_shards=8).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
