"""Blocking properties: cap bounds, salted-join equivalence,
pair determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from el import blocking
from el.fixtures import gen_web_pages
from el.pipeline import PipelineConfig, mentions_stage


def _keys(spark, n=400):
    mentions = mentions_stage(gen_web_pages(spark, n), PipelineConfig(use_lsh=False))
    return blocking.name_token_keys(mentions)


def test_cap_bounds_block_size(spark):
    keys = _keys(spark)
    capped, stats = blocking.cap_blocks(keys, cap_k=10)
    mx = (
        capped.groupBy("strategy", "block_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert mx <= 10
    # stats account for every dropped member
    total = keys.count()
    kept = capped.count()
    dropped = stats.agg(F.sum("n_dropped")).collect()[0][0] or 0
    assert kept + dropped == total


def test_pairs_dedup_and_order(spark):
    keys = _keys(spark)
    capped, _ = blocking.cap_blocks(keys, cap_k=30)
    pairs = blocking.candidate_pairs(capped).persist()
    assert pairs.where("a_id >= b_id").count() == 0
    assert (
        pairs.groupBy("a_id", "b_id").count().where("count > 1").count() == 0
    )
    pairs.unpersist()


def test_salted_join_equals_unsalted(spark):
    fact = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(int(i), f"d{i}") for i in range(7)], "k long, name string"
    )
    plain = fact.join(dim, on="k").select("k", "v", "name")
    salted = blocking.salted_join(fact, dim, key="k", n_salts=4).select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    assert plain.count() == 2000
