"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

# module-level so the pandas-UDF type hints (stringified by the
# `from __future__ import annotations` semantics of the defining scope)
# resolve against this module's globals
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.session import get_spark

# Headline queries: one per engine capability family (scan-agg, multi-join,
# top-k, window, sessionize, as-of join, text search, relevance ranking,
# text analysis, minhash/near-dup dedup, contamination, quality gate,
# vector search exact+ANN). bench time = sum over these.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "top_customers_by_revenue",
    "latest_order_per_customer",
    "events_hourly",
    "event_sessions",
    "asof_purchase_to_view",
    "keyword_search_hit",
    "term_frequencies",
    "minhash_signatures",
    "near_dup_pairs_minhash",
    "quality_filter_pipeline",
    "cosine_topk_bruteforce",
    "ann_topk_lsh",
    # the round-1 rewrites whose wins SCALE.md measured — tracked so a
    # regression shows up in the round bench, not just locally
    "bm25_keyword_ranking",
    "tfidf_keyword_ranking",
    "benchmark_contamination",
    # round-3 flagships: contamination-adjacent overlap detection, SimHash
    # banding (the second near-dup family), and the fixed-point iterative
    # trainer — the new expensive shapes worth a regression guard
    "doc_overlap_winnowing",
    "simhash_near_dup_pairs",
    "kmeans_fixed_point",
    "semantic_dedup_pairs",
    # round-4: the heaviest shapes from the completed TPC-H suite — the
    # 5-way star join (q9), the HAVING semi-join re-aggregation (q18), and
    # the decorrelated EXISTS/NOT-EXISTS pair (q21)
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_suppliers",
    # round-4 (late): the Gopher repetition gate and cross-doc passage
    # mining — the two new text-corpus shapes (line-digest agg + gram
    # explode with top-k) worth a regression guard
    "repetition_signals",
    "repeated_passages",
    # round-4 (final session): the data-selection flagships and the
    # composed curation funnel — broadcast micro-model scoring, the
    # distributed-ntile LM bucketing, and the five-stage DAG.
    # set_similarity_prefix_pairs is deliberately NOT here: its true
    # result on the self-similar synthetic corpus is ~3M pairs at sf0.1
    # (24% of all pairs exceed 0.8 Jaccard), so its cost is output-bound
    # — measured and explained in SCALE.md instead.
    "dsir_importance_weights",
    "perplexity_tercile_mix",
    "pipeline_funnel_report",
    # the two remaining expensive NEW shapes: the PIT as-of join over the
    # SCD2 history and the skip-gram pair explode
    "pit_priority_revenue",
    "pmi_cooccurrence",
    # round-5: the DEPLOY L3/L4 store-backed read paths next to their
    # self-contained twins (VERDICT r4 #2). The stores are primed in the
    # warm-up (ingest-time work), so these numbers are the production
    # probe/pair-gen plans: fingerprint-table scan instead of the 61-sum
    # explode vote; pruned (t, bucket) index probe instead of corpus
    # re-bucketing.
    "simhash_near_dup_pairs_from_store",
    "ann_topk_lsh_from_store",
    "bm25_keyword_indexed",
    # round-5: incremental ingest admission — fingerprint ONLY the new
    # batch, band-join it against the persisted corpus fingerprints (the
    # L4 ingest loop; the corpus is never re-fingerprinted)
    "simhash_incremental_admission",
    # round-5 (late): the sketch/eval/quality additions — the Bloom
    # membership scorecard, the bloom-fronted decontamination next to its
    # exact twin above (SCALE.md pins the 10x crossover), the per-rule
    # data-quality gate, the sampled-frame real video decode, the seeded
    # epoch shuffle, and the ANN recall eval (its exact brute-force arm is
    # the deliberate cost model: 5 sample queries x corpus)
    "bloom_membership_report",
    "bloom_prefilter_contamination",
    "data_quality_report",
    "video_sampled_frame_decode",
    "shuffle_shard_order",
    "ann_recall_eval",
    # round-5 (final session): the three new expensive shapes — Z-order
    # layout assignment (two scalable_ntile passes over the Morton code),
    # PQ encode + ADC top-k (the third ANN family: broadcast-codebook
    # argmin over vec x subspace, then the table-lookup scan), and
    # positional phrase search (per-token pruned posting self-join).
    # kmv_theta_set_ops / skyline_orders / pq_code_histogram are cheap
    # post-agg shapes — covered by the parity sweep, not worth bench slots.
    "zorder_layout",
    "pq_adc_topk",
    "pq_adc_topk_from_store",
    "phrase_search_positional",
    # hybrid fusion runs both retrieval arms end-to-end; cusum is the
    # events-scan + per-type-window time-series shape
    "hybrid_search_rrf",
    "cusum_changepoint",
    # round-5 (third session): the expensive new shapes — the basket
    # self-join pair mining (association rules), the customer-level CF
    # co-occurrence (larger fan-out than baskets), and the blocked fuzzy
    # linkage (levenshtein inside a prefix-blocked join). The feature /
    # eval / interval queries (loo encoding, welch, winsorize, seasonal,
    # open-orders, markov, mrl recall) are single-window or post-agg
    # shapes — parity-swept, not worth bench slots.
    "association_rules",
    "item_item_similarity",
    "entity_resolution_blocked",
    # round-5 (fourth session): the graph pair (wedge enumeration over the
    # relative-support co-purchase edges — the floor is the scale knob,
    # SCALE.md), the leave-last-out recommender eval (co-matrix rebuild +
    # candidate join, the heaviest new shape), and the cohort triangle
    # (two user-keyed fact reductions). funnel / acf / woe / weighted
    # sample are single-pass or calendar-sized — parity-swept, not worth
    # bench slots; streamed_unconverted_views is wave-staging-bound like
    # the other streaming queries (SCALE.md), which bench excludes.
    "triangle_participation",
    "adamic_adar_links",
    "recsys_hitrate_eval",
    "cohort_retention_matrix",
    # round-5 (fifth session): the two substantive governance/eval shapes —
    # naive-Bayes distillation (double corpus explode + token-keyed model
    # join + per-doc argmax) and exact AUC (fact reduction + distributed
    # prefix-sum). The remaining governance audits (t-closeness, DP counts,
    # GDPR cascade, orphan/Benford/hashing) are dimension-sized aggregates —
    # parity-swept, not worth bench slots.
    "naive_bayes_quality_distill",
    "score_auc_eval",
    # round-5 (sixth session): the one new expensive shape — the seeded
    # label-propagation superstep loop (4 iterative rounds of edge-join +
    # min-struct reduce over the co-purchase graph, localCheckpoint'd
    # between rounds). The causal pair / RBO / Arrow-transport twins are
    # dimension-sized or post-LIMIT shapes — parity-swept, not benched.
    "label_propagation_seeded",
    # round-5 (seventh session): Kneser-Ney LM scoring — the four-agg +
    # three-token-keyed-join smoothing shape over the bigram explode.
    # dbscan_grid_clusters is deliberately NOT here: its wall is the
    # connected-components round count (graph diameter of the
    # near-percolating synthetic plane — 17 scheduling-bound rounds at
    # sf0.1, data work per round tiny), measured and explained in
    # SCALE.md; benching it would measure the scheduler, not a plan.
    "kneser_ney_doc_scores",
    # round-5 (seventh session, late): the three distinct new shapes worth
    # slots — exact CDF-walk distribution shift (conditional agg to the
    # value domain), content-defined chunking (position explode collapsing
    # to the sparse boundary set), and late-interaction MaxSim (broadcast
    # sub-vector scoring). The eval/attribution batch (shapley, sprt,
    # conformal, replay, kappa, fd audit, theil-sen) is dimension- or
    # split-pass-sized — parity-swept, not worth bench slots;
    # minhash_recall_eval and image_phash_near_dup are pair-volume-bound
    # (SCALE.md); seeded_random_walks is round-count-bound like dbscan.
    "distribution_emd_ks",
    "cdc_chunk_dedup_report",
    "maxsim_multivector_topk",
    # round-5 (eighth session): no new slots. The four additions are cheap
    # shapes by design — hilbert_layout is the zorder_layout skeleton plus
    # a fused 12-stage projection (isolated ~1.9 s warm at sf0.1, the
    # earlier 10.7 s read was first-query warm-up, the r4-established
    # trap); hits_hub_authority is three fact-scan combinable aggs with
    # broadcast score frames; mann_whitney_u and jl_projection_distortion
    # collapse to value-domain / constant-fan-out frames. All
    # parity-swept + SCALE.md-measured instead.
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark("ccdem-bench")
    queries = plans.all_queries()

    # Warm the JVM, file index and parquet footers once so the per-query
    # numbers measure the plans, not session startup / FS metadata.
    queries["point_lookup_order"](spark, sf_dir).collect()
    from code_challenge___data_engineer___machinemax_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    # Warm the Python worker pool + Arrow serialization path the same way:
    # the first pandas-UDF query otherwise pays worker spawn (~2s measured,
    # the whole r2->r3 ann_topk_lsh "regression" — SCALE.md), which is
    # session startup, not the plan under measurement.
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    # repartition to (at least) the executor-thread count so the FULL worker
    # pool spawns here — an 8-partition warm-up leaves the remaining workers
    # to be spawned inside whichever UDF query first runs wider (measured:
    # kmeans_fixed_point +3s when it, not the warm-up, paid the spawn)
    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(4 * n_workers).repartition(2 * n_workers).select(
        _warm("id")
    ).collect()

    # Prime the persisted layouts (DEPLOY.md L3/L4) — ingest-time work a
    # production deployment does once when data lands, not per query. The
    # *_from_store headline entries then measure the probe/pair-gen read
    # path, which is the plan a 100 TB deployment actually runs.
    from code_challenge___data_engineer___machinemax_spark.stores import (
        ensure_bm25_index_store,
        ensure_pq_store,
        ensure_simhash_store,
        ensure_srp_store,
    )

    ensure_simhash_store(spark, sf_dir)
    ensure_srp_store(spark, sf_dir)
    ensure_bm25_index_store(spark, sf_dir)
    ensure_pq_store(spark, sf_dir)

    # NOTE (measured, r5 seventh session): a per-query gc.collect() hook —
    # meant to unpersist each query's localCheckpoint RDDs before the next
    # query — was A/B'd and REJECTED: it recovered the bench-tail queries
    # (recsys_hitrate_eval 37.5 -> 24.8 s; isolated truth 19.1 s) but the
    # ContextCleaner's ASYNC unpersist then ran inside the next timed
    # region (simhash_near_dup_pairs 4.3 -> 14.4 s, total 150 -> 181 s).
    # In-bench numbers for late heavy queries therefore overstate plan
    # cost by warm-state pressure; SCALE.md carries the isolated numbers.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
