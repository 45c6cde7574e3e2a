"""Isolated steady-state timing for named queries: fresh session, family
warm-up discipline of bench.py (table footers + pandas-UDF pool), run 0
discarded, N timed runs printed. Usage:

    python scripts/time_query.py <query> [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401  (pandas-UDF type-hint resolution)

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.session import get_spark
from code_challenge___data_engineer___machinemax_spark.tables import TABLES, load_table


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"time-{name}")
    q = plans.all_queries()[name]
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    spark.sparkContext.setJobDescription(f"timed: {name}")
    q(spark, sf_dir).collect()  # run 0: codegen/scan warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: {times} min={min(times)}")


if __name__ == "__main__":
    main()
