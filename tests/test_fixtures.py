"""Fixture determinism: the corpus is a pure function of (n, seed),
independent of partitioning — the sandbox form of the byte-identity
invariant (SURVEY.md §0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from el.fixtures import gen_labeled_pairs, gen_web_pages
from el.schemas import WEB_PAGES


def _sha_map(df):
    rows = (
        df.groupBy("url")
        .agg(F.max("warc_ts").alias("ts"))
        .join(df, on="url")
        .where(F.col("warc_ts") == F.col("ts"))
        .select("url", F.sha2(F.col("text"), 256).alias("sha"))
        .collect()
    )
    return {r["url"]: r["sha"] for r in rows}


def test_schema(spark):
    df = gen_web_pages(spark, 50)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in WEB_PAGES.fields
    ]


def test_partitioning_independence(spark):
    a = _sha_map(gen_web_pages(spark, 300, num_partitions=2))
    b = _sha_map(gen_web_pages(spark, 300, num_partitions=16))
    assert a == b


def test_corpus_properties(spark):
    df = gen_web_pages(spark, 500).persist()
    n = df.count()
    assert n == 500
    # recrawls: duplicate urls exist
    assert df.select("url").distinct().count() < n
    # null text ~1%
    nulls = df.where("text IS NULL").count()
    assert 0 < nulls < 25
    # lang skew: en majority
    langs = dict(df.groupBy("lang").count().collect())
    assert langs["en"] > n * 0.4
    # recrawl rows share content with their original
    dup = (
        df.groupBy("url")
        .count()
        .where("count > 1")
        .join(df, on="url")
        .groupBy("url")
        .agg(F.count_distinct("text").alias("k"))
        .where("k > 1")
        .count()
    )
    assert dup == 0
    df.unpersist()


def test_labels_deterministic_and_sane(spark):
    l1 = gen_labeled_pairs(spark, 300)
    l2 = gen_labeled_pairs(spark, 300)
    r1 = sorted(map(tuple, l1.collect()))
    r2 = sorted(map(tuple, l2.collect()))
    assert r1 == r2
    pos = sum(1 for r in r1 if r[3] == 1)
    neg = len(r1) - pos
    assert pos > 50 and neg >= pos
    assert all(a < b for a, b, _, _ in r1)


def test_bench_steal_probe():
    """bench._steal_frac returns a sane fraction (or None on platforms
    without the /proc/stat steal column) — the quiet-gate's starvation
    signal must never crash or return junk."""
    import bench

    s = bench._steal_frac(interval=0.05)
    assert s is None or 0.0 <= s <= 1.0
