"""Semantic invariants for the round-6 batch-prep / eval / quantization
queries — properties the oracle hash can't express (bounds, conservation,
rate targets)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as mod
from code_challenge___data_engineer___machinemax_spark.plans.packing_queries import (
    _shard_col,
    context_window_packing,
    ffd_packing_report,
)

_QS = mod.queries()


def test_packing_conservation_and_fill_bounds(spark, sf_dir):
    rows = _QS["context_window_packing"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # windows hold exactly the token mass: (n_windows-1)*B < total <= n_windows*B
        assert (r.n_windows - 1) * 512 < r.total_tokens <= r.n_windows * 512
        # fill rate is (0, 1e6]; only the last window can be slack
        assert 0 < r.fill_e6 <= 1_000_000
        assert 0 <= r.split_docs <= r.n_docs


def test_packing_sub_shard_knob_rollup_invariants(spark, sf_dir):
    """The sub_shards skew knob (VERDICT r6 #2) must preserve the volume
    columns exactly and can only add the per-shard partial final windows:
    n_windows grows by at most sub_shards - 1 per source (sum-of-ceils vs
    ceil-of-sum), and the fill stays a valid rate."""
    base = {r.source: r for r in context_window_packing(spark, sf_dir).collect()}
    k = 4
    sharded = {
        r.source: r
        for r in context_window_packing(spark, sf_dir, sub_shards=k).collect()
    }
    assert set(base) == set(sharded)
    for s, r in sharded.items():
        b = base[s]
        assert (r.n_docs, r.total_tokens) == (b.n_docs, b.total_tokens)
        assert b.n_windows <= r.n_windows <= b.n_windows + (k - 1)
        assert 0 < r.fill_e6 <= 1_000_000
        assert 0 <= r.split_docs <= r.n_docs


def test_ffd_sub_shard_knob_rollup_invariants(spark, sf_dir):
    """Sharded FFD is still a valid whole-source packing: volumes and the
    lower bound are shard-invariant, and the rolled-up bin count respects
    the ceil(total/B) bound."""
    base = {r.source: r for r in ffd_packing_report(spark, sf_dir).collect()}
    sharded = {
        r.source: r
        for r in ffd_packing_report(spark, sf_dir, sub_shards=4).collect()
    }
    assert set(base) == set(sharded)
    for s, r in sharded.items():
        b = base[s]
        assert (r.n_docs, r.total_tokens, r.lower_bound_bins) == (
            b.n_docs,
            b.total_tokens,
            b.lower_bound_bins,
        )
        assert r.lower_bound_bins <= r.n_bins <= r.n_docs
        assert 0 < r.fill_e6 <= 1_000_000


def test_sub_shard_salt_bounds_planted_mega_source(spark):
    """The knob's 100 TB contract: a planted mega-source's widest
    (source, sub_shard) slice is a hash fraction of the source, never the
    whole source — the shape that otherwise becomes one straggler window
    partition / one executor-killing array cell."""
    d = spark.range(2000).select(
        F.lit("mega").alias("source"),
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
    )
    k = 8
    widths = [
        r["count"]
        for r in d.select(_shard_col(k).alias("shard"))
        .groupBy("shard")
        .count()
        .collect()
    ]
    assert len(widths) == k
    assert max(widths) <= 2 * 2000 // k


def test_padding_report_waste_identity(spark, sf_dir):
    rows = _QS["length_bucket_padding_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.padded_tokens == r.n_docs * r.bucket
        assert r.wasted_tokens == r.padded_tokens - r.real_tokens
        assert 0 < r.efficiency_e6 <= 1_000_000
        # power-of-two bucket with floor 16
        assert r.bucket >= 16 and (r.bucket & (r.bucket - 1)) == 0


def test_span_mask_rate_near_contract(spark, sf_dir):
    rows = _QS["span_corruption_mask_stats"](spark, sf_dir).collect()
    total = sum(r.total_tokens for r in rows)
    masked = sum(r.masked_tokens for r in rows)
    # hash-derived Bernoulli(0.15): corpus-level realized rate within 2pp
    assert abs(masked / total - 0.15) < 0.02
    for r in rows:
        # avg span length >= 1 token whenever any span exists
        if r.n_spans:
            assert r.avg_span_len_e6 >= 1_000_000
            assert r.n_spans <= r.masked_tokens


def test_rouge2_bounds_and_f1_between(spark, sf_dir):
    rows = _QS["rouge2_adjacent_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= min(r.n_cand, r.n_ref)
        assert 0 <= r.precision_e6 <= 1_000_000
        assert 0 <= r.recall_e6 <= 1_000_000
        # integer-div harmonic mean sits within 1 ulp-of-e6 of [min, max]
        lo, hi = sorted((r.precision_e6, r.recall_e6))
        assert lo - 1 <= r.f1_e6 <= hi + 1


def test_int8_quant_error_bounds(spark, sf_dir):
    rows = _QS["embedding_int8_quant_error"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # per-component error of round-to-nearest <= scale/(2*127): the
        # e6 worst-case component error is avg_scale-independent but
        # bounded by max scale; use the loose engine-level bound
        assert 0 <= r.max_abs_err_e6 <= r.avg_scale_e6  # << in practice
        assert r.avg_sse_e12 >= 0
        assert r.n_vecs > 0


def test_fertility_at_least_one_piece_per_word(spark, sf_dir):
    rows = _QS["tokenizer_fertility_by_lang"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pieces >= r.n_words  # every word needs >= 1 piece
        assert r.fertility_e6 >= 1_000_000
        # a piece is at most 4 chars, so chars/piece <= 4
        assert r.chars_per_piece_e6 <= 4_000_000


def test_doremi_shares_normalize_and_upweight_hard(spark, sf_dir):
    rows = _QS["doremi_domain_reweighting"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.mix_share for r in rows) - 1.0) < 1e-3
    # EG monotonicity: higher excess loss => weakly larger weight
    by_excess = sorted(rows, key=lambda r: r.excess_e6)
    weights = [r.weight_e6 for r in by_excess]
    assert weights == sorted(weights)


def test_schema_evolution_counts_match_base(spark, sf_dir):
    from code_challenge___data_engineer___machinemax_spark.tables import load_table

    rows = _QS["schema_evolution_rollup"](spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    by = {r.channel: r for r in rows}
    # v1 snapshot (even keys, no channel column) back-fills to 'unknown'
    assert "unknown" in by and set(by) == {"unknown", "app", "store", "web"}


def test_ffd_packing_bounds(spark, sf_dir):
    rows = _QS["ffd_packing_report"](spark, sf_dir).collect()
    assert rows
    total_bins = total_lb = 0
    for r in rows:
        # FFD can never beat the volume lower bound, and never exceeds
        # one-bin-per-doc
        assert r.lower_bound_bins <= r.n_bins <= r.n_docs
        assert 0 < r.fill_e6 <= 1_000_000
        total_bins += r.n_bins
        total_lb += r.lower_bound_bins
    # Johnson's FFD guarantee vs OPT >= volume lower bound, checked in
    # aggregate (9*FFD <= 11*OPT + 6, per shard summed over shards)
    assert 9 * total_bins <= 11 * total_lb + 6 * len(rows)
