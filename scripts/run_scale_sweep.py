"""Run the non-pair-emitting bench headline queries at an arbitrary sf dir
(default the 10x key-shifted replica from make_scale.py) and print one JSON
line of per-query timings — the 0.1 -> ~1 scaling evidence for SCALE.md.

Pair-emitting queries (near_dup_pairs_minhash, simhash_near_dup_pairs,
doc_overlap_winnowing) are excluded by default: the replica holds every
document in 10 identical key-shifted copies, so their output is dominated
by the deliberate worst-case cross-replica pair blowup measured separately
in SCALE.md (hot-bucket-cap section), not by plan scaling.

Usage: python scripts/run_scale_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from code_challenge___data_engineer___machinemax_spark import plans  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.session import get_spark  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.tables import TABLES, load_table  # noqa: E402

PAIR_EMITTING = {
    "near_dup_pairs_minhash",
    "near_dup_pairs_minhash_from_store",
    "simhash_near_dup_pairs",
    "doc_overlap_winnowing",
    "doc_overlap_winnowing_from_store",
    "set_similarity_prefix_pairs",
    # the store-backed/incremental twins hit the same deliberate
    # cross-replica near-dup blowup (10 identical key-shifted copies of
    # every document) — candidate volume, not plan scaling, dominates
    "simhash_near_dup_pairs_from_store",
    "simhash_incremental_admission",
    # rides the same verified near-dup pair closure — cross-replica pair
    # volume, not plan scaling, dominates at the 10-copy replica
    "near_dup_sampling_weights",
    # its L4 store twin reads a membership whose size is the same
    # cross-replica blowup (the store BUILD pays the closure)
    "near_dup_sampling_weights_from_store",
    # the key shift preserves doc_id % 10, so every bench doc gains 10
    # bench copies x 10 train copies of each match — the same deliberate
    # cross-replica blowup
    "minhash_decontamination",
}

# semantic_dedup_pairs is also excluded: its oracle pins k=8 (right for the
# sf0.01 gate), but the operator's documented scale path is k∝n — running
# the fixed-k registered query at 100x the vectors measures quadratic
# within-cluster pairing the operator contract says to avoid. SCALE.md's
# k-scaling section measures the operator at the replica with k scaled.
FIXED_PARAM = {"semantic_dedup_pairs", "semantic_dedup_pairs_from_store"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ccdem_scale_sf1"
    spark = get_spark("ccdem-scale-sweep")
    queries = plans.all_queries()

    queries["point_lookup_order"](spark, sf_dir).collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    # prime every persisted layout UNTIMED, matching the bench protocol:
    # ensure_* is ingest-time work a deployment does once per data
    # landing; without this the first *_from_store query at a fresh
    # sf_dir pays the store BUILD inside its timed region (round-8
    # sweep: item_item_similarity_from_store read 22.7 s with the L9
    # build folded in vs 2.4 s as the probe it actually is)
    from bench import _FAMILY_STORES
    from code_challenge___data_engineer___machinemax_spark import stores

    for fns in _FAMILY_STORES.values():
        for fn in fns:
            getattr(stores, fn)(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in PAIR_EMITTING | FIXED_PARAM:
            continue
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "scale_sweep_total", "value": total, "unit": "sec", "queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
