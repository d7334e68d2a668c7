"""Similarity kernels vs their oracles (DuckDB jaro_winkler_similarity
is the authority for F5)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from el.simfn import cosine_dense, cosine_sparse, jaro_winkler


def _duck_jw(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    out = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT jaro_winkler_similarity(a, b) FROM t"
            ).fetchall()
        ]
    )
    con.close()
    return out


def test_jw_known_values():
    got = jaro_winkler(["martha", "dixon", "abc"], ["marhta", "dicksonx", "abc"])
    assert got[0] == pytest.approx(0.9611, abs=1e-4)
    assert got[1] == pytest.approx(0.8133, abs=1e-3)
    assert got[2] == 1.0


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef X.", max_size=20),
            st.text(alphabet="abcdef X.", max_size=20),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_jw_matches_duckdb(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler(a, b)
    want = _duck_jw(pairs)
    assert np.allclose(got, want, atol=1e-9)


def test_cosine_sparse():
    a_idx = [np.array([1, 5, 9]), np.array([2]), np.zeros(0, np.int32)]
    a_val = [
        np.array([0.6, 0.8, 0.0], np.float32),
        np.array([1.0], np.float32),
        np.zeros(0, np.float32),
    ]
    b_idx = [np.array([5, 9]), np.array([3]), np.array([1])]
    b_val = [
        np.array([1.0, 0.5], np.float32),
        np.array([1.0], np.float32),
        np.array([1.0], np.float32),
    ]
    got = cosine_sparse(a_idx, a_val, b_idx, b_val)
    assert got[0] == pytest.approx(0.8)
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_cosine_dense():
    got = cosine_dense([[1.0, 0.0], [1.0, 1.0], None], [[1.0, 0.0], [1.0, -1.0], [1.0]])
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == 0.0
