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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.session import get_spark

# Headline queries: one per engine capability family (scan-agg, multi-join,
# top-k, window, set-op, text search, text analysis, minhash dedup, vector
# search). bench time = sum over these.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "top_customers_by_revenue",
    "latest_order_per_customer",
    "events_hourly",
    "keyword_search_hit",
    "term_frequencies",
    "minhash_signatures",
    "cosine_topk_bruteforce",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark("ccdem-bench")
    queries = plans.all_queries()

    # Warm the JVM + parquet footers once with the cheapest query so the
    # per-query numbers measure the plans, not session startup.
    queries["point_lookup_order"](spark, sf_dir).collect()

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
