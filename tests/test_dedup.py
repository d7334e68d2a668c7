"""Dedup-family properties: exact dedup on planted copies, SimHash
Spark/python parity + near-dup detection, MinHash-LSH recall on the
corpus's planted near-dup pairs, and n-gram Jaccard symmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from el.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_pairs,
    simhash_py,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def test_exact_dedup_planted_copies(spark):
    rows = [(1, "aa bb"), (2, "aa bb"), (3, "cc dd"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.keep_id, r.n_copies) for r in exact_dedup(df).collect()}
    assert got == {(1, 2), (3, 1)}


def test_simhash_spark_matches_python(spark, docs):
    sample = docs.where("text is not null").limit(20)
    sh = {r.doc_id: r.simhash for r in simhash_col(sample, "text", "doc_id").collect()}
    import re

    tok_re = re.compile(r"[a-z0-9]+")
    for r in sample.select("doc_id", "text").collect():
        assert sh[r.doc_id] == simhash_py(tok_re.findall(r.text.lower()))


def test_simhash_near_text_low_hamming(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(1, base), (2, base.replace("dog", "cat")), (3, "totally different words entirely unrelated corpus")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a_id, r.b_id): r.hamming for r in simhash_pairs(df, max_hamming=20).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_finds_planted_neardups(spark, docs):
    # ground truth: bigram-Jaccard >= 0.8 pairs (planted by the driver)
    truth = {
        (r.a_id, r.b_id)
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.8).collect()
    }
    assert truth, "fixture should contain planted near-dup pairs"
    cand = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(docs, shingle_k=5, rows=4, bands=16).collect()
    }
    missed = truth - cand
    assert not missed, f"LSH missed near-dup pairs: {missed}"


def test_ngram_jaccard_bounds_and_block(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.5).persist()
    bad = pairs.where((F.col("jaccard") < 0.5) | (F.col("jaccard") > 1.0)).count()
    assert bad == 0
    assert pairs.where("a_id >= b_id").count() == 0
    pairs.unpersist()


def test_embedding_neardup_ids_ordered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = embedding_neardup_pairs(emb, threshold=0.3).persist()
    assert pairs.count() > 0
    assert pairs.where("a_id >= b_id").count() == 0
    pairs.unpersist()
