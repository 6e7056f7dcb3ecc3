"""The production BPE encode kernel (linear-scan pair-ranking replay,
operators/text.bpe_encode_production) must be the SAME function as the
oracle-checkable fold replay (operators/text.bpe_encode) — on corpus
text with the trained table, and on trained tables far larger than the
8-merge oracle size.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import pg2kafka_spark.operators.text as X
from pg2kafka_spark.catalog import load_table
from pg2kafka_spark.operators.text import _bpe_encode_word


def _ranks(merges_df) -> dict:
    return {
        (r["pair_a"], r["pair_b"]): r["step"]
        for r in merges_df.select("step", "pair_a", "pair_b").collect()
    }


class TestKernelUnits:
    def test_no_applicable_merges_is_identity_chars(self):
        assert _bpe_encode_word("abc", {}) == ["a", "b", "c"]

    def test_single_char_word(self):
        assert _bpe_encode_word("a", {("a", "a"): 1}) == ["a"]

    def test_left_to_right_non_overlapping(self):
        # "aaa" with (a,a): leftmost pair merges, third 'a' survives —
        # the trainer's replace semantics, not a right-biased variant.
        assert _bpe_encode_word("aaa", {("a", "a"): 1}) == ["aa", "a"]

    def test_all_occurrences_merge_in_one_pass(self):
        assert _bpe_encode_word("abab", {("a", "b"): 1}) == ["ab", "ab"]

    def test_rank_order_beats_position_order(self):
        # (b,c) outranks (a,b): "abc" must become [a, bc] even though
        # (a,b) appears first in the string.
        ranks = {("a", "b"): 2, ("b", "c"): 1}
        assert _bpe_encode_word("abc", ranks) == ["a", "bc"]

    def test_cascading_merges(self):
        # (a,b) then (ab,c): the second merge consumes the first's
        # output token.
        ranks = {("a", "b"): 1, ("ab", "c"): 2}
        assert _bpe_encode_word("abc", ranks) == ["abc"]

    def test_later_merge_enables_earlier_rank_pair(self):
        # The scan kernel re-checks ALL ranks each round: after (b,c)
        # fires, (a,bc) at rank 1 becomes available and must win over
        # nothing — the fold would catch this too since 1 < 2 is only
        # reachable when 'bc' exists, which trained tables guarantee.
        ranks = {("a", "bc"): 3, ("b", "c"): 1}
        assert _bpe_encode_word("abc", ranks) == ["abc"]


class TestFoldEquivalence:
    """The load-bearing claim: kernel ≡ fold on TRAINED tables."""

    def _assert_equal(self, spark, docs, merges):
        fold = X.bpe_encode(docs, merges).orderBy("doc_id").toPandas()
        prod = (
            X.bpe_encode_production(docs, merges)
            .orderBy("doc_id")
            .toPandas()
        )
        pd.testing.assert_frame_equal(fold, prod)

    def test_corpus_8_merges(self, spark, sf_dir):
        docs = load_table(spark, "documents", sf_dir)
        merges = X.bpe_train_merges(docs, n_merges=8)
        self._assert_equal(spark, docs, merges)

    @pytest.mark.slow
    @pytest.mark.heavy_e2e
    def test_corpus_64_merges(self, spark, sf_dir):
        """8× the oracle's table depth — the regime where the fold
        starts paying per-table-row and the scan kernel does not;
        equivalence must hold at every depth, not just the oracle's."""
        docs = load_table(spark, "documents", sf_dir).limit(120)
        merges = X.bpe_train_merges(docs, n_merges=64)
        self._assert_equal(spark, docs, merges)

    @pytest.mark.heavy_e2e
    def test_unseen_text_same_table(self, spark, sf_dir):
        """Serving means encoding NEW text with a persisted table —
        words the trainer never saw must still encode identically."""
        docs = load_table(spark, "documents", sf_dir)
        merges = X.bpe_train_merges(docs, n_merges=8)
        new = spark.createDataFrame(
            [
                (1, "the scan table filter joins the stream"),
                (2, "zzzz unseen zzzz tokens qqq"),
                (3, "a"),
            ],
            "doc_id long, text string",
        )
        self._assert_equal(spark, new, merges)


class TestScaleShape:
    def test_kernel_cost_independent_of_table_size(self):
        """Padding the rank table with 10k never-firing merges must
        not change the result (and the kernel only scans pairs present
        in the word, so it cannot even look at them)."""
        ranks = {("a", "b"): 1}
        padded = dict(ranks)
        padded.update(
            {(f"x{i}", f"y{i}"): i + 2 for i in range(10_000)}
        )
        assert _bpe_encode_word("abab", ranks) == _bpe_encode_word(
            "abab", padded
        )

    @pytest.mark.heavy_e2e
    def test_distinct_word_stage_is_vocab_sized(self, spark, sf_dir):
        """The Arrow kernel runs over DISTINCT words: the plan must
        contain exactly one ArrowEvalPython, fed below the final
        doc-key aggregation."""
        docs = load_table(spark, "documents", sf_dir)
        merges = X.bpe_train_merges(docs, n_merges=8)
        plan = (
            X.bpe_encode_production(docs, merges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1
