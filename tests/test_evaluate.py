"""clustering_agreement: pair-counting Rand / Adjusted Rand."""

from __future__ import annotations

from el.evaluate import clustering_agreement


def _cl(spark, assign):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(assign)], "doc_id long, cluster_id long"
    )


def test_agreement_hand_computed_case(spark):
    # A = {0,1},{2,3}; B = {0,1,2},{3}: 3 of 6 pairs agree -> RI 0.5;
    # expected-index term equals s_both exactly -> ARI 0
    a = _cl(spark, [1, 1, 2, 2])
    b = _cl(spark, [1, 1, 1, 2])
    r = clustering_agreement(a, b).collect()[0]
    assert (r.n_docs, r.n_pairs) == (4, 6)
    assert (r.s_both, r.s_a, r.s_b) == (1, 2, 3)
    assert r.ri == 0.5 and r.ari == 0.0


def test_agreement_identical_and_relabelled(spark):
    a = _cl(spark, [1, 1, 2, 2, 3])
    b = _cl(spark, [7, 7, 9, 9, 8])  # same partition, different labels
    r = clustering_agreement(a, b).collect()[0]
    assert r.ri == 1.0 and r.ari == 1.0


def test_agreement_degenerate_all_singletons(spark):
    # both all-singletons: agreement trivially 1, ARI denominator 0 -> NULL
    a = _cl(spark, [1, 2, 3, 4])
    b = _cl(spark, [5, 6, 7, 8])
    r = clustering_agreement(a, b).collect()[0]
    assert r.ri == 1.0 and r.ari is None
