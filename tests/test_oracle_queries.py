"""Every SQL-expressible check query must match the DuckDB oracle at
sf0.01 — the same comparison the driver runs per round."""

from __future__ import annotations

import pytest

from el.queries import REGISTRY
from el.testing.oracle import compare, duckdb_conn

from .conftest import SF01

SQL_CHECKS = sorted(n for n, c in REGISTRY.items() if c.oracle is not None)
ROWS_ONLY = sorted(n for n, c in REGISTRY.items() if c.oracle is None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", SQL_CHECKS)
def test_query_matches_oracle(spark, con, name):
    chk = REGISTRY[name]
    compare(chk.fn(spark, SF01), con, chk.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF01)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
