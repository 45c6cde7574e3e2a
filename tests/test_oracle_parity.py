"""The local correctness gate: every registered query with an oracle must
match DuckDB on the test scale factor — the same check the driver runs at
sf0.01.

This module runs at sf0.01 by default (not the suite-wide sf0.001): rounding
ties and dtype edge cases only materialize with row volume (round 1's sweep
at sf0.001 stayed green while the driver failed 6 queries at sf0.01).
Override with SPARK_GRAFT_TEST_SF_DIR.

Tiered (round 11, VERDICT r10 #1): the default run sweeps a
deterministic ~6 % sample of the registry; SPARK_GRAFT_FULL_TESTS=1
sweeps everything (see tests/_tiers.py). The full sweep remains the
pre-commit bar for any change that touches query semantics."""

from __future__ import annotations

import os

import pytest

from code_challenge___data_engineer___machinemax_spark import plans

from ._tiers import sweep_tier
from .oracle_harness import compare, duck_connection

_QUERIES = plans.all_queries()
_ORACLES = plans.all_oracles()

_PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def sf_dir() -> str:  # overrides the session-wide sf0.001 fixture
    return _PARITY_SF_DIR


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sweep_tier(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = _QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, duck, _ORACLES[name])
    assert ok, f"{name}: {msg}"


# the rows-only set is small (~20) — always run it in full
@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
