"""Similarity kernels vs their oracles (DuckDB jaro_winkler_similarity
is the authority for F5)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from el.simfn import JW_MAX_LEN, cosine_dense, cosine_sparse, jaro_winkler


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


def test_jw_mixed_length_banding_matches_duckdb():
    # rows land in different pow-2 bands (1, 8, 32, 128); banding must
    # be invisible in the results
    pairs = [
        ("a", "b"),
        ("martha", "marhta"),
        ("jellyfish industries", "jellyfish industry"),
        ("x" * 100, "x" * 99 + "y"),
        ("", "nonempty"),
        ("abcdef", "abcdef"),
    ]
    got = jaro_winkler([p[0] for p in pairs], [p[1] for p in pairs])
    want = _duck_jw(pairs)
    assert np.allclose(got, want, atol=1e-9)


def test_jw_hostile_long_name_is_bounded():
    # r3 verdict "What's wrong #1": a single 4 KB all-caps "name" in a
    # batch must not set the kernel width for the whole batch (the old
    # kernel would ask numpy for an (n, 4096, 4096) mask).  With
    # JW_MAX_LEN + banding this completes in normal memory and equals
    # JW of the truncated strings.
    long_a = "HOME ABOUT PRODUCTS CONTACT " * 150  # ~4.2 KB
    long_b = "HOME ABOUT PRODUCTS CAREERS " * 150
    a = [long_a] + ["martha"] * 5000
    b = [long_b] + ["marhta"] * 5000
    got = jaro_winkler(a, b)
    want_long = _duck_jw([(long_a[:JW_MAX_LEN], long_b[:JW_MAX_LEN])])[0]
    assert got[0] == pytest.approx(want_long, abs=1e-9)
    assert got[1] == pytest.approx(0.9611, abs=1e-4)
    # short rows are exact (never truncated, never in the long band)
    assert np.allclose(got[1:], got[1], atol=0)


def test_jw_kernel_chunking_is_invisible():
    # force multi-chunk execution inside one band and pin bit-equality
    import el.simfn as simfn

    a = [f"name {i:04d} alpha" for i in range(400)]
    b = [f"name {i:04d} beta" for i in range(400)]
    base = jaro_winkler(a, b)
    old = simfn._KERNEL_BUDGET
    simfn._KERNEL_BUDGET = 32 * 32 * 7  # 7 rows per chunk in the 32-band
    try:
        chunked = jaro_winkler(a, b)
    finally:
        simfn._KERNEL_BUDGET = old
    assert np.array_equal(base, chunked)


def test_mention_runs_are_capped():
    from el.extract import _RE_MENTION

    hostile = " ".join(["NAVIGATION"] * 100)
    spans = [m.group(0) for m in _RE_MENTION.finditer(hostile)]
    assert spans, "capped regex must still match"
    assert max(len(s) for s in spans) <= 330  # 12 tokens x <=26 chars + spaces
    # every token is still covered by some mention (split, not dropped)
    assert sum(len(s.split()) for s in spans) == 100
    # normal names unchanged
    m = _RE_MENTION.search("met with John A. Smith, yesterday")
    assert m is not None and m.group(0) == "John A. Smith,"


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


def test_jw_oracle_inputs_stay_under_max_len():
    """Coupling guard: the f5/lk1 driver oracles compare our
    JW_MAX_LEN-truncated kernel against DuckDB's UNTRUNCATED
    jaro_winkler_similarity — which only hash-matches while every
    oracle input string fits in JW_MAX_LEN bytes. Pin that invariant
    on the driver SFs so a future fixture/SF change fails HERE with a
    clear message instead of as an opaque driver hash mismatch."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        mx = con.execute(
            f"""
            SELECT greatest(max(strlen(lower(p_brand))),
                            max(strlen(lower(p_type))),
                            max(strlen(lower(p_name))))
            FROM read_parquet('/root/testdata/{sf}/part.parquet')
            """
        ).fetchone()[0]
        assert mx <= JW_MAX_LEN, (
            f"{sf}: a part column reaches {mx} bytes > JW_MAX_LEN="
            f"{JW_MAX_LEN}; the f5/lk1 DuckDB oracles would diverge from "
            "the truncated kernel — truncate in the oracle SQL or raise "
            "JW_MAX_LEN"
        )


def _duck_me(pairs):
    con = duckdb.connect()
    out = []
    for a, b in pairs:
        if not a or not b:
            out.append(0.0)
            continue
        out.append(
            con.execute(
                """SELECT list_avg(list_transform(?::VARCHAR[], x ->
                     list_max(list_transform(?::VARCHAR[], y ->
                       jaro_winkler_similarity(x, y)))))""",
                [list(a), list(b)],
            ).fetchone()[0]
        )
    con.close()
    return out


@settings(deadline=None, max_examples=40)
@given(
    st.lists(
        st.tuples(
            st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=10), max_size=4),
            st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=10), max_size=4),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_monge_elkan_matches_duckdb_bit_exactly(pairs):
    from el.simfn import monge_elkan

    got = monge_elkan([p[0] for p in pairs], [p[1] for p in pairs])
    want = _duck_me(pairs)
    # inner JW is bit-identical; the final mean's accumulation may
    # differ from DuckDB's list_avg by <= 1 ulp for 3+ tokens
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_monge_elkan_asymmetry_and_edges():
    from el.simfn import monge_elkan

    # asymmetric by definition: every 'acme' token finds itself in
    # the bigger set, but not vice versa
    ab = monge_elkan([["acme"]], [["acme", "zzz"]])[0]
    ba = monge_elkan([["acme", "zzz"]], [["acme"]])[0]
    assert ab == 1.0 and ba < 1.0
    # empty / None sides score 0; identical sets score 1
    out = monge_elkan(
        [[], None, ["a"], ["paris", "tx"]],
        [["x"], ["x"], [], ["paris", "tx"]],
    )
    assert out.tolist() == [0.0, 0.0, 0.0, 1.0]


def test_monge_elkan_one_sided_row_does_not_corrupt_neighbors():
    """Regression: a (ka>0, kb=0) row once injected a zero-length
    reduceat segment, corrupting every row after it (['paris'] vs
    ['paris'] scored 2.0)."""
    from el.simfn import monge_elkan

    out = monge_elkan(
        [["smith", "jon"], ["a"], ["paris"]],
        [["jon", "smyth"], [], ["paris"]],
    )
    assert out[1] == 0.0
    assert out[2] == 1.0
