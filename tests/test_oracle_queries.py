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


def test_w7_approx_percentiles_rank_error_bound(spark):
    """w7 is rows-only by design (GK sketch), but its accuracy
    contract is testable: with accuracy=10000 the rank error is at
    most n/10000 < 1 rank for sf0.01 group sizes, so the approximate
    percentile must equal SOME value within +-1 rank of the exact
    rank — here we assert the stronger practical property that each
    approx percentile sits between the exact neighboring ranks."""
    import duckdb

    from el.queries import REGISTRY

    rows = REGISTRY["w7_approx_percentiles"].fn(spark, SF01).collect()
    con = duckdb.connect()
    exact = {}
    for q in (0.5, 0.9, 0.99):
        for pri, lo, hi in con.execute(
            f"""
            SELECT o_orderpriority,
                   quantile_disc(o_totalprice, GREATEST({q} - 0.001, 0)),
                   quantile_disc(o_totalprice, LEAST({q} + 0.001, 1))
            FROM read_parquet('{SF01}/orders.parquet')
            GROUP BY o_orderpriority
            """
        ).fetchall():
            exact[(pri, q)] = (lo, hi)
    assert rows
    for r in rows:
        for q, v in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            lo, hi = exact[(r.o_orderpriority, q)]
            assert lo <= v <= hi, (r.o_orderpriority, q, v, lo, hi)
