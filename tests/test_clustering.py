"""Large-star/small-star connected components vs union-find oracle."""

from __future__ import annotations

import random

import pytest

from el.clustering import clusters_of, connected_components
from el.testing.union_find import components


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df).collect()
    return {r["mention_id"]: r["cluster_id"] for r in got}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 100, 80), (3, 200, 300), (4, 50, 5)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = components(edges)
    got = _spark_cc(spark, edges)
    assert got == want


def test_cc_chain_and_clique(spark):
    chain = [(i, i + 1) for i in range(0, 40)]
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    got = _spark_cc(spark, chain + clique)
    assert all(got[i] == 0 for i in range(41))
    assert all(got[100 + i] == 100 for i in range(6))


def test_clusters_of_singletons(spark):
    mentions = spark.createDataFrame(
        [(1, "u1"), (2, "u2"), (3, "u3")], "mention_id long, url string"
    )
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["mention_id"]: r["cluster_id"] for r in clusters_of(mentions, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 3}
