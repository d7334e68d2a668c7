"""Flagship query for the driver smoke: the full entity-resolution
pipeline — extract -> 3-strategy blocking (name_token + lsh_band +
LDA topic) -> capped/skew-aware pair generation -> fused Arrow
scoring -> large-star/small-star clustering — on the deterministic
synthetic web_pages corpus (BASELINE.json input_hint shape), returning
the cluster table.

The corpus size scales with the sf tier so the smoke stays fast at
sf0.001 while bench exercises real volume (bench.py)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from el.fixtures import gen_web_pages
from el.pipeline import PipelineConfig, run_pipeline

_SF_RE = re.compile(r"sf([0-9.]+)")

# pages per unit sf (sf0.001 -> 900; sf0.1 -> 90_000)
PAGES_PER_SF = 900_000


def n_pages_for(sf_dir: str, cap: int = 120_000) -> int:
    m = _SF_RE.search(sf_dir)
    sf = float(m.group(1)) if m else 0.001
    return max(600, min(cap, int(sf * PAGES_PER_SF)))


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = n_pages_for(sf_dir, cap=2_000)  # smoke tier: keep entry() quick
    pages = gen_web_pages(spark, n)
    out = run_pipeline(spark, pages, PipelineConfig())
    return (
        out["clusters"]
        .join(
            out["mentions"].select("mention_id", "surface"),
            on="mention_id",
            how="inner",
        )
        .select("url", "mention_id", "surface", "cluster_id")
        .orderBy("url", "mention_id")
    )
