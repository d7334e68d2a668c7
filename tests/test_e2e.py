"""End-to-end gate: full pipeline (all three blocking strategies —
name_token + lsh_band + LDA topic buckets) on the seeded fixture.
This is the BASELINE.md gate: pairwise F1 >= 0.99 on labeled pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from el.evaluate import blocking_recall, pairwise_scores, primary_clusters
from el.fixtures import gen_labeled_pairs, gen_web_pages
from el.pipeline import PipelineConfig, run_pipeline

N_PAGES = 1200


@pytest.fixture(scope="module")
def e2e(spark):
    pages = gen_web_pages(spark, N_PAGES).persist()
    cfg = PipelineConfig(use_lsh=True, use_topics=True)
    out = run_pipeline(spark, pages, cfg)
    out["mentions"] = out["mentions"].persist()
    out["block_keys"] = out["block_keys"].persist()
    out["scored_pairs"] = out["scored_pairs"].persist()
    out["clusters"] = out["clusters"].persist()
    labeled = gen_labeled_pairs(spark, N_PAGES).persist()
    return out, labeled


def test_all_three_strategies_present(spark, e2e):
    out, _ = e2e
    strategies = {
        r[0] for r in out["block_keys"].select("strategy").distinct().collect()
    }
    assert strategies == {"name_token", "lsh_band", "topic"}


def test_blocking_recall_floor(spark, e2e):
    out, labeled = e2e
    br = blocking_recall(labeled, out["block_keys"], out["mentions"])
    assert br >= 0.99


def test_pairwise_f1(spark, e2e):
    out, labeled = e2e
    uc = primary_clusters(out["clusters"], out["mentions"])
    res = pairwise_scores(labeled, uc)
    assert res["f1"] >= 0.99, res
    assert res["precision"] >= 0.99, res
    assert res["recall"] >= 0.99, res


def test_scored_pairs_symmetric_ids(spark, e2e):
    out, _ = e2e
    bad = out["scored_pairs"].where("a_id >= b_id").count()
    assert bad == 0


def test_f1_gate_holds_with_binding_fit_sample_cap(spark):
    """At 100 TB the TF-IDF/LDA fit runs on a hash-sample, so the
    gate must hold when the cap BINDS (here: 300 of ~900 mentions).
    IDF/topic structure are corpus statistics — a uniform sample
    preserves them; this pins that claim."""
    pages = gen_web_pages(spark, N_PAGES).localCheckpoint()
    cfg = PipelineConfig(use_lsh=True, use_topics=True, fit_sample_max=300)
    out = run_pipeline(spark, pages, cfg)
    labeled = gen_labeled_pairs(spark, N_PAGES)
    uc = primary_clusters(out["clusters"], out["mentions"])
    res = pairwise_scores(labeled, uc)
    assert res["f1"] >= 0.99, res


def test_pipeline_survives_empty_corpus(spark):
    """Degenerate input (nothing passes the lang gate) must produce
    empty-but-well-formed stage tables, not an ml-fit crash."""
    from pyspark.sql import functions as F

    pages = gen_web_pages(spark, 50).where(F.col("lang") == "nonexistent")
    out = run_pipeline(spark, pages, PipelineConfig())
    assert out["clusters"].count() == 0
    assert out["scored_pairs"].count() == 0
    assert "cluster_id" in out["clusters"].columns


def test_blocking_reduction_ratio_exact(spark):
    from el.evaluate import blocking_reduction_ratio

    # blocks of size 3, 2, 1 -> cand = 3 + 1 + 0 = 4; N=6 -> all = 15
    rows = [(i, b) for i, b in enumerate(["x", "x", "x", "y", "y", "z"])]
    df = spark.createDataFrame(rows, "id long, blk string")
    r = blocking_reduction_ratio(df, "blk").collect()[0]
    assert (r.n_rows, r.cand_pairs, r.all_pairs) == (6, 4, 15)
    assert abs(r.reduction_ratio - (1.0 - 4.0 / 15.0)) < 1e-12
