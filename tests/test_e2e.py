"""End-to-end gate: full pipeline on the seeded fixture.

The BASELINE.md gate (F1 >= 0.99 with all three blocking strategies)
is asserted in test_e2e_full once M3 lands; this module always keeps
the name-token-only slice green as the regression floor."""

from __future__ import annotations

import pytest

from el.evaluate import blocking_recall, pairwise_scores, primary_clusters
from el.fixtures import gen_labeled_pairs, gen_web_pages
from el.pipeline import PipelineConfig, run_pipeline

N_PAGES = 1200


@pytest.fixture(scope="module")
def e2e(spark):
    pages = gen_web_pages(spark, N_PAGES).persist()
    cfg = PipelineConfig(use_lsh=False, use_topics=False)
    out = run_pipeline(spark, pages, cfg)
    out["mentions"] = out["mentions"].persist()
    out["clusters"] = out["clusters"].persist()
    labeled = gen_labeled_pairs(spark, N_PAGES).persist()
    return out, labeled


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
