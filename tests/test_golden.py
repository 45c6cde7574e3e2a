"""Golden-corpus regression suite (sqllogictest-style).

Replays every registered query in Spark at sf0.001 and checks it against
the pinned golden file (scripts/make_golden.py): column set, row count, and
— for oracle-backed queries — the md5 over canonical rows. No DuckDB in the
loop: this is the regression net that catches a behavior change in either
the query OR a careless oracle edit, and it runs anywhere.

Regenerate after an *intentional* semantics change:
    python scripts/make_golden.py

Tiered (round 11, VERDICT r10 #1): the default run replays a
deterministic ~6 % sample of the registry; SPARK_GRAFT_FULL_TESTS=1
replays everything (see tests/_tiers.py).
"""

from __future__ import annotations

import hashlib
import os

import pytest

import __spark_entry__ as mod
from tests._tiers import sweep_tier
from tests.oracle_harness import normalized_rows

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN_SF_DIR = "/root/testdata/sf0.001"

_QS = mod.queries()


def _load_golden(name: str) -> dict:
    path = os.path.join(GOLDEN_DIR, f"{name}.golden")
    if not os.path.exists(path):
        pytest.fail(f"no golden file for {name!r}; run scripts/make_golden.py")
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            k, _, v = line.partition(":")
            out[k.strip()] = v.strip()
    return out


@pytest.mark.parametrize("name", sweep_tier(_QS))
def test_golden(spark, name):
    golden = _load_golden(name)
    df = _QS[name](spark, GOLDEN_SF_DIR)
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.collect()]
    assert ",".join(sorted(cols)) == golden["columns"], "column set changed"
    assert len(rows) == int(golden["rows"]), "row count changed"
    if "md5" in golden:
        canon = normalized_rows(cols, rows)
        digest = hashlib.md5("\n".join(repr(r) for r in canon).encode()).hexdigest()
        assert digest == golden["md5"], "values changed vs golden corpus"


# the 6 driver-unverifiable rows-only queries: value-pinned at sf0.01
# (scripts/make_golden.py ROWS_ONLY_VALUE_PIN; VERDICT r3 next-round #6).
# Their outputs are deterministic across fresh sessions — float cosine and
# fake-decode are pure functions, the seeded sampler and the HLL/quantile
# sketches are deterministic given the pinned session layout (local[8],
# shuffle=8, one input file).
_VALUE_PINNED = [
    "embedding_near_dup_pairs",
    "bernoulli_sample_stats",
    "approx_distinct_users",
    "approx_order_percentiles",
    "kmeans_codebook",
    "media_decode_features",
]


@pytest.mark.parametrize("name", _VALUE_PINNED)
def test_rows_only_value_pinned(spark, name):
    golden = _load_golden(f"{name}.sf0_01")
    df = _QS[name](spark, "/root/testdata/sf0.01")
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.collect()]
    assert ",".join(sorted(cols)) == golden["columns"]
    assert len(rows) == int(golden["rows"])
    canon = normalized_rows(cols, rows)
    digest = hashlib.md5("\n".join(repr(r) for r in canon).encode()).hexdigest()
    assert digest == golden["md5"], "values changed vs value-pinned golden"
