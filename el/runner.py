"""Checkpointed, resumable pipeline runner (SURVEY.md §3.2-3.3,
north_rule "resumable from checkpoint with per-partition lineage +
metrics").

Every stage boundary is a catalog commit (atomic parquet+manifest, or
Iceberg when the jar is present): the inter-stage IR is a committed
table, never an in-memory plan. ``--resume`` re-opens committed stages
as scans instead of recomputing them.

The scoring stage — the expensive one — is additionally chunked into
``n_score_chunks`` deterministic hash buckets of the pair set
(``pmod(xxhash64(a_id, b_id), K)``); each chunk commits independently,
so a killed run resumes mid-stage, skipping completed chunks and
scoring only the remainder (the semi/anti-join resume discipline at
chunk granularity; pair membership in a chunk is a pure function of
the pair ids, so a resume scores exactly the not-yet-done pairs).

Model artifacts (TF-IDF idf table, LDA topic model) are committed
under ``<root>/_models/<run_id>`` on first fit and RELOADED on resume
— refitting on a different partitioning could drift float reductions
and change buckets (SURVEY.md §4.4); persisted models make reruns and
cross-parallelism runs bit-stable.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from el import blocking
from el.catalog import HadoopParquetCatalog
from el.clustering import clusters_of
from el.pipeline import (
    PipelineConfig,
    mentions_stage,
    raw_block_keys,
    skew_capped_keys,
)
from el.scoring import matched_edges, score_pairs
from el.tfidf import TfidfModel


@dataclass
class RunConfig:
    run_id: str = "run0"
    n_score_chunks: int = 8
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    # explicit model-artifact dir: share one fitted TF-IDF/LDA artifact
    # set across runs AND across cluster sizes (SURVEY.md §4.4 — the
    # scaling-evidence protocol fits once, then both parallelism
    # levels load the same artifacts)
    model_dir: str | None = None


def _models_dir(catalog: HadoopParquetCatalog, rc: "RunConfig") -> str:
    return rc.model_dir or os.path.join(catalog.root, "_models", rc.run_id)


def _fit_or_load_models(
    spark: SparkSession,
    mentions: DataFrame,
    catalog: HadoopParquetCatalog,
    rc: RunConfig,
):
    mdir = _models_dir(catalog, rc)
    tfidf_path = os.path.join(mdir, "tfidf")
    topic_path = os.path.join(mdir, "topics")
    if os.path.exists(os.path.join(tfidf_path, "meta.json")):
        tfidf = TfidfModel.load(tfidf_path)
    else:
        tfidf = TfidfModel.fit(
            mentions, "context", max_fit_docs=rc.pipeline.fit_sample_max
        )
        tfidf.save(tfidf_path)
    topics = None
    if rc.pipeline.use_topics and not mentions.isEmpty():
        from el.topics import TopicModel

        if os.path.exists(os.path.join(topic_path, "lda")):
            topics = TopicModel.load(spark, topic_path)
        else:
            topics = TopicModel.fit(
                spark,
                mentions,
                "context",
                max_iter=rc.pipeline.topic_max_iter,
                vocab_size=rc.pipeline.topic_vocab,
                max_fit_docs=rc.pipeline.fit_sample_max,
            )
            topics.save(topic_path)
    return tfidf, topics


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    catalog: HadoopParquetCatalog,
    rc: RunConfig | None = None,
    resume: bool = False,
) -> dict:
    """Full pipeline with a commit per stage; returns
    {stage: {"rows": n, "wall_ms": ms, "resumed": bool}} plus handles.
    """
    rc = rc or RunConfig()
    cfg = rc.pipeline
    report: dict[str, dict] = {}

    def stage(name: str, build, **write_kw) -> DataFrame:
        t0 = time.time()
        if resume and catalog.committed(name, rc.run_id):
            df = catalog.read(spark, name)
            report[name] = {
                "rows": catalog.manifest(name)["total_rows"],
                "wall_ms": int((time.time() - t0) * 1000),
                "resumed": True,
            }
            return df
        df = build()
        m = catalog.write(df, name, run_id=rc.run_id, stage=name, **write_kw)
        report[name] = {
            "rows": m["total_rows"],
            "wall_ms": int((time.time() - t0) * 1000),
            "resumed": False,
        }
        return catalog.read(spark, name)

    mentions = stage("mentions", lambda: mentions_stage(pages, cfg))

    tfidf, topics = _fit_or_load_models(spark, mentions, catalog, rc)
    mentions_v = tfidf.transform(mentions, "context", "tfidf")
    topic_buckets = None
    if topics is not None:
        mentions_v = topics.transform(mentions_v, "context", "topic_vec")
        topic_buckets = topics.bucket_keys(mentions_v)
    mentions_v = stage("mentions_vec", lambda: mentions_v)

    # the COMMITTED block_keys table is the raw (uncapped) key union —
    # cap/salt is applied at pair-generation time (r5: a cap must be a
    # query-time policy, not a storage mutation, or members dropped by
    # one run's cap are lost to every later incremental re-cap; see
    # el.pipeline.raw_block_keys)
    block_keys = stage(
        "block_keys",
        lambda: raw_block_keys(mentions, cfg, topic_buckets),
        partition_by=["strategy"],
    )
    pairs = stage(
        "candidate_pairs",
        lambda: blocking.candidate_pairs(skew_capped_keys(block_keys, cfg)[0]),
    )

    # -- chunked scoring (mid-stage resumability) ------------------------
    K = rc.n_score_chunks
    chunk_col = F.pmod(F.xxhash64("a_id", "b_id"), F.lit(K)).cast("int")
    chunked = pairs.withColumn("_chunk", chunk_col)
    t0 = time.time()
    n_resumed = 0
    for k in range(K):
        name = f"scored_chunk_{k:03d}"
        if resume and catalog.committed(name, rc.run_id):
            n_resumed += 1
            continue
        chunk = chunked.where(F.col("_chunk") == k).drop("_chunk")
        catalog.write(
            score_pairs(chunk, mentions_v, cfg.scoring),
            name,
            run_id=rc.run_id,
            stage="scored_pairs",
        )
    scored = spark.read.parquet(
        *[catalog._dir(f"scored_chunk_{k:03d}") for k in range(K)]
    )
    # row count from the chunk manifests — the commit already recorded
    # each chunk's total_rows, so the report must not re-scan the
    # corpus-sized chunk tables just to add them up (VERDICT r3 #6;
    # same fix incremental reports got in r3)
    n_scored = sum(
        catalog.manifest(f"scored_chunk_{k:03d}")["total_rows"]
        for k in range(K)
    )
    report["scored_pairs"] = {
        "rows": n_scored,
        "wall_ms": int((time.time() - t0) * 1000),
        "resumed": n_resumed == K,
        "chunks_resumed": n_resumed,
        "chunks_total": K,
    }

    edges = stage("edges", lambda: matched_edges(scored))
    clusters = stage("clusters", lambda: clusters_of(mentions, edges))

    return {
        "report": report,
        "mentions": mentions,
        "scored_pairs": scored,
        "clusters": clusters,
        "metrics": catalog.metrics(spark),
    }
