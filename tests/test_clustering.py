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


def _numpy_pagerank(edges, damping=0.85, n_iter=10):
    """Independent dense reference: synchronous power iteration with
    uniform dangling redistribution (no decimal rounding — the Spark
    op is compared within float tolerance, exactness is g1's job)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, b in set(edges):
        out.setdefault(a, []).append(b)
    r = [1.0 / n] * n
    for _ in range(n_iter):
        nxt = [0.0] * n
        dm = sum(r[idx[v]] for v in nodes if v not in out)
        for a, dsts in out.items():
            c = r[idx[a]] / len(dsts)
            for b in dsts:
                nxt[idx[b]] += c
        r = [(1 - damping) / n + damping * (x + dm / n) for x in nxt]
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_reference_with_dangling(spark):
    """Crafted graph with a DANGLING node (3 has no out-edges): its
    mass must be redistributed uniformly, not dropped — total rank
    stays 1 and every node matches the dense reference."""
    from el.clustering import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (4, 0), (4, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # the dangling sink accumulates the most mass on this graph
    assert max(got, key=got.get) == 3


def test_pagerank_dedups_edges_and_is_partition_invariant(spark):
    from el.clustering import pagerank

    edges = [(0, 1), (0, 1), (1, 0), (1, 2), (2, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {r.node: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)  # reference dedups via set(edges)
    for v in want:
        assert abs(base[v] - want[v]) < 1e-9
    again = {
        r.node: r["rank"]
        for r in pagerank(df.repartition(7)).collect()
    }
    assert again == base  # bit-identical across partitionings


def test_cluster_cohesion_chain_vs_clique(spark):
    from el.clustering import cluster_cohesion

    # cluster 0: 4-node CHAIN (3 intra edges of 6 possible, weakest
    # edge score 1 = the bridge); cluster 1: 3-node CLIQUE (3/3);
    # cluster 2: singleton (0 possible, no edges); one cross edge
    # (3 -> 4) and one edge to an id missing from clusters must be
    # excluded from every cohesion count
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1), (7, 2)],
        "id long, cl long",
    )
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 1), (2, 3, 4),            # chain
         (4, 5, 9), (5, 6, 8), (4, 6, 7),            # clique
         (3, 4, 6),                                  # cross
         (0, 99, 9)],                                # missing endpoint
        "a_id long, b_id long, s int",
    )
    out = {
        r["cl"]: r
        for r in cluster_cohesion(
            clusters, edges, id_col="id", cluster_col="cl",
            a_col="a_id", b_col="b_id", score_col="s",
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    c0, c1, c2 = out[0], out[1], out[2]
    assert (c0["n_members"], c0["n_possible_pairs"],
            c0["n_intra_edges"]) == (4, 6, 3)
    assert (c0["min_score"], c0["max_score"]) == (1, 5)  # bridge = 1
    assert (c1["n_members"], c1["n_possible_pairs"],
            c1["n_intra_edges"]) == (3, 3, 3)
    assert (c2["n_members"], c2["n_possible_pairs"],
            c2["n_intra_edges"]) == (1, 0, 0)
    assert c2["min_score"] is None and c2["max_score"] is None


def test_cross_cluster_edges_rollup_and_canonical_pair(spark):
    from el.clustering import cross_cluster_edges

    clusters = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 30)], "id long, cl long"
    )
    # two 10<->20 crossings (one written 20-side-first: the pair key
    # must canonicalize), one 10<->30, one intra (excluded), one
    # missing endpoint (excluded)
    edges = spark.createDataFrame(
        [(0, 2, 3), (2, 1, 7), (1, 3, 2), (0, 1, 9), (3, 42, 5)],
        "a_id long, b_id long, s int",
    )
    got = {
        (r["cluster_a"], r["cluster_b"]): r
        for r in cross_cluster_edges(
            clusters, edges, id_col="id", cluster_col="cl",
            a_col="a_id", b_col="b_id", score_col="s",
        ).collect()
    }
    assert set(got) == {(10, 20), (10, 30)}
    assert got[(10, 20)]["n_cross_edges"] == 2
    assert got[(10, 20)]["max_score"] == 7
    assert got[(10, 30)]["n_cross_edges"] == 1


def test_cluster_audit_partition_invariance_and_no_score(spark):
    from el.clustering import cluster_cohesion, cross_cluster_edges

    clusters = spark.createDataFrame(
        [(i, i // 3) for i in range(30)], "id long, cl long"
    )
    edges = spark.createDataFrame(
        [(i, i + 2, i % 5) for i in range(28)],
        "a_id long, b_id long, s int",
    )
    a = sorted(
        map(tuple, cluster_cohesion(
            clusters.repartition(1), edges.repartition(1),
            id_col="id", cluster_col="cl",
            a_col="a_id", b_col="b_id",
        ).collect())
    )
    b = sorted(
        map(tuple, cluster_cohesion(
            clusters.repartition(11), edges.repartition(7),
            id_col="id", cluster_col="cl",
            a_col="a_id", b_col="b_id",
        ).collect())
    )
    assert a == b
    # score-less variant drops the score columns entirely
    cols = cross_cluster_edges(
        clusters, edges, id_col="id", cluster_col="cl",
        a_col="a_id", b_col="b_id",
    ).columns
    assert cols == ["cluster_a", "cluster_b", "n_cross_edges"]
