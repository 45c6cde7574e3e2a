"""The local correctness gate: every registered query with an oracle must
match DuckDB on the test scale factor — the same check the driver runs at
sf0.01."""

from __future__ import annotations

import pytest

from code_challenge___data_engineer___machinemax_spark import plans

from .oracle_harness import compare, duck_connection

_QUERIES = plans.all_queries()
_ORACLES = plans.all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = _QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, duck, _ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
