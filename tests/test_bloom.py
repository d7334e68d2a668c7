"""Bloom prune join: no false negatives, exactness with verify, FP
rate, partitioning invariance (el/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from el.bloom import bloom_prune, bloom_semi_join
from el.io import load_table

from .conftest import SF01


def _probe(spark):
    return load_table(spark, SF01, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("key"), "o_totalprice"
    )


def _keys(spark):
    return (
        load_table(spark, SF01, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )


def test_no_false_negatives_and_verify_exact(spark):
    probe, keys = _probe(spark), _keys(spark)
    cols = ["o_orderkey", "key", "o_totalprice"]  # semi-join reorders; align
    exact = probe.join(keys.distinct(), "key", "left_semi").select(*cols)
    pruned = bloom_prune(probe, keys, "key", num_bits=1 << 20, k=5).select(*cols)
    # every exact match survives the prune
    assert exact.exceptAll(pruned).count() == 0
    # verify=True is exactly the semi-join
    got = bloom_semi_join(probe, keys, "key", num_bits=1 << 20, k=5).select(*cols)
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_false_positive_rate_bounded(spark):
    probe = _probe(spark)
    # keys disjoint from the probe's key domain: everything kept is a FP
    absent = spark.range(1_000_000, 1_001_000).select(F.col("id").alias("key"))
    n = probe.count()
    kept = bloom_prune(probe, absent, "key", num_bits=1 << 20, k=5).count()
    # m=2^20, n=1000, k=5 -> theoretical fp ~ 1e-11; allow huge slack
    assert kept / n < 0.01


def test_prune_partitioning_invariant(spark):
    probe, keys = _probe(spark), _keys(spark)
    a = bloom_prune(probe.repartition(3), keys, "key", num_bits=1 << 19).count()
    b = bloom_prune(probe.repartition(17), keys, "key", num_bits=1 << 19).count()
    assert a == b


def test_prune_is_superset_not_equal_at_tiny_filter(spark):
    """With a deliberately undersized filter the prune keeps false
    positives (superset), which verify then removes — pinning that the
    exactness comes from the verify join, not from luck."""
    probe, keys = _probe(spark), _keys(spark)
    exact_n = probe.join(keys.distinct(), "key", "left_semi").count()
    pruned_n = bloom_prune(probe, keys, "key", num_bits=1 << 10, k=2).count()
    assert pruned_n > exact_n  # saturated filter -> FPs present
    got_n = bloom_semi_join(probe, keys, "key", num_bits=1 << 10, k=2).count()
    assert got_n == exact_n


def test_build_side_type_mismatch_still_exact(spark):
    """String-typed build keys against a bigint probe key: the build
    side is coerced to the probe type before hashing, so no true
    match is pruned (xxhash64('5') != xxhash64(5L) otherwise)."""
    probe = _probe(spark)
    keys_str = _keys(spark).select(F.col("key").cast("string").alias("key"))
    cols = ["o_orderkey", "key", "o_totalprice"]
    exact = probe.join(_keys(spark).distinct(), "key", "left_semi").select(*cols)
    got = bloom_semi_join(probe, keys_str, "key", num_bits=1 << 20).select(*cols)
    assert exact.exceptAll(got).count() == 0
    assert got.exceptAll(exact).count() == 0
