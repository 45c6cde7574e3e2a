"""The cheaper guard tier for the graphrec family's self-contained
heavies (VERDICT r7 #6 rebalance): the five self-contained graphrec
queries each rebuild the basket join purely as INGEST regression guards —
their deployment plans are the L9 *_from_store read paths the bench now
publishes as the family headline. One self-contained guard stays in the
timed bench per round (bench.py:_GRAPHREC_GUARD_ROTATION, round-robin);
the other four run here: a timed sf0.01 execution with a generous wall
ceiling, so a structural regression in the shared basket-join prefix (a
lost broadcast, a recompute tree, a skew blow-up) still fails CI loudly
even in rounds when that query is not the bench's published guard.

Correctness of all five stays pinned by the full oracle parity sweep
(tests/test_oracle_parity.py, same sf0.01); this module guards COST only.
The ceiling is ~10x the queries' steady-state sf0.01 wall (sub-second to
~2 s each, BENCH_r07 scaled down) — loose enough to never flake on a cold
JVM, tight enough that an accidental O(n^2) shape (the 112-scan
adamic_adar recompute tree of SCALE.md round 7 cost ~4x) still trips it.
"""

from __future__ import annotations

import time

import pytest

from bench import _GRAPHREC_GUARD_ROTATION, HEADLINE
from code_challenge___data_engineer___machinemax_spark import plans

_GUARD_SF_DIR = "/root/testdata/sf0.01"
_WALL_CEILING_S = 30.0

# the four rotation members NOT published in this round's bench
_TIER2 = sorted(set(_GRAPHREC_GUARD_ROTATION) - set(HEADLINE))


def test_rotation_publishes_exactly_one_guard():
    """bench.py must keep exactly ONE rotation member in the timed
    headline set — the round-robin contract of the r8 rebalance."""
    assert len(set(_GRAPHREC_GUARD_ROTATION) & set(HEADLINE)) == 1
    assert len(_TIER2) == 4


@pytest.mark.parametrize("name", _TIER2)
def test_self_contained_ingest_guard(name, spark):
    t0 = time.perf_counter()
    rows = plans.all_queries()[name](spark, _GUARD_SF_DIR).collect()
    wall = time.perf_counter() - t0
    assert len(rows) > 0, f"{name}: ingest guard returned no rows"
    assert wall < _WALL_CEILING_S, (
        f"{name}: self-contained ingest path took {wall:.1f}s at sf0.01 "
        f"(ceiling {_WALL_CEILING_S}s) — the shared basket-join prefix "
        "has structurally regressed; EXPLAIN it against SCALE.md's "
        "round-7 recompute-tree audit"
    )
