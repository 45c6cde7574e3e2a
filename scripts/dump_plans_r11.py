"""Dump per-query formatted plans to plans/r11/<query>_<tag>.txt for the
round-11 optimization evidence (VERDICT judge checks plan claims against
these files).

Usage: python scripts/dump_plans_r11.py <before|after> [query ...]
Defaults to every bench headline query when no names are given.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from code_challenge___data_engineer___machinemax_spark import plans  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r11")
    qs = plans.all_queries()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
