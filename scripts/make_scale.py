"""Materialize a key-shifted 10x replica of sf0.1 (~sf1: 6M lineitem rows)
under /tmp/ccdem_scale_sf1, preserving join semantics: fact keys
(orderkey, doc_id, vec_id, event_id) shift per replica so per-key fan-out
stays constant; dimension tables are kept as-is (customers/suppliers/parts
see 10x the orders, as a real sf1 would).

Usage: python scripts/make_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_challenge___data_engineer___machinemax_spark.session import get_spark  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.tables import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/ccdem_scale_sf1"

# table -> columns to shift by replica * offset (keys that must stay unique)
SHIFTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 100_000_000


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("make-scale")
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    for name, keys in SHIFTS.items():
        base = load_table(spark, SRC, name)
        out = None
        for i in range(replicas):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            out = rep if out is None else out.unionByName(rep)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: x{replicas}")
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
