"""Incremental entity resolution: absorb a NEW crawl batch into an
existing clustered corpus, scoring only the delta (north_rule
resumability discipline applied to the algorithm itself, not just to
crash recovery).

Mechanics (J4/J5 semi/anti-join ops from SURVEY.md §2.3):
1. extract mentions from the new batch; drop urls already ingested
   (left_anti on the committed mentions table — append-only policy);
2. vectorize with the PERSISTED TF-IDF/LDA artifacts (models are
   pipeline inputs — never refit on a delta, §4.4; missing artifacts
   are an ERROR, not a refit trigger);
3. re-derive block keys for new mentions, union with the committed
   key table, RE-CAP with the batch pipeline's skew policy (so hot
   blocks stay bounded across absorbed batches), then restrict to
   blocks TOUCHED by the delta (left_semi on the delta's distinct
   (strategy, block_key) set): an untouched block's member set is
   identical to the committed run's, so it cannot produce an unscored
   pair — the expensive pair self-join's input scales with the DELTA,
   not the corpus;
4. **delta = candidate pairs anti-joined against already-scored
   pairs** — only pairs touching the new batch (or newly co-blocked)
   reach the expensive scoring stage;
5. union scored tables, recompute connected components over the full
   edge set (edges are tiny relative to pairs; large-star/small-star
   converges in O(log n) rounds from scratch — incremental CC state
   is not worth the complexity at this edge density);
6. commit APPEND-ONLY: the corpus-sized tables (mentions,
   mentions_vec, scored pairs) each gain one ``<base>_delta_NNNN``
   table per absorbed batch and are read back merge-on-read
   (``_read_with_deltas``) — commit I/O scales with the delta. Only
   block_keys (re-capped, bounded strings) and clusters (global CC
   output) are rewritten; Iceberg row-level ops remove those two
   rewrites when the jar is present.

Equivalence: with capping disabled (or cap never reached),
``incremental(A then B) == full(A ∪ B)`` exactly — asserted in
tests/test_incremental.py. When a hot block is capped, the combined
run may retain a different member subset than the two-step run; the
incremental result is then a SUPERSET of the full run's pair set
(already-scored pairs are never unscored), i.e. recall never
regresses from incremental processing.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from el import blocking
from el.catalog import HadoopParquetCatalog
from el.clustering import clusters_of
from el.pipeline import PipelineConfig, block_stage, mentions_stage
from el.runner import RunConfig, _fit_or_load_models, _models_dir
from el.scoring import matched_edges, score_pairs


def _delta_names(catalog: HadoopParquetCatalog, base: str) -> list[str]:
    """Committed append-only delta tables for ``base``, in order."""
    if not os.path.isdir(catalog.root):
        return []
    return sorted(
        d
        for d in os.listdir(catalog.root)
        if d.startswith(f"{base}_delta_") and catalog.exists(d)
    )


def _read_with_deltas(spark, catalog: HadoopParquetCatalog, base: str):
    """Merge-on-read: base table ∪ its committed deltas. This is the
    append-only discipline for the O(corpus)-payload tables — each
    absorbed batch commits ONLY its delta (Iceberg's append shape);
    nothing ever rewrites the corpus-sized tables."""
    df = catalog.read(spark, base)
    for d in _delta_names(catalog, base):
        df = df.unionByName(catalog.read(spark, d))
    return df


def _next_delta(catalog: HadoopParquetCatalog, base: str) -> str:
    return f"{base}_delta_{len(_delta_names(catalog, base)):04d}"


def incremental_update(
    spark: SparkSession,
    new_pages: DataFrame,
    catalog: HadoopParquetCatalog,
    rc: RunConfig | None = None,
) -> dict:
    """Absorb ``new_pages`` into the catalog's committed pipeline
    tables; returns {"report": {...}, "clusters": DataFrame}."""
    rc = rc or RunConfig()
    cfg: PipelineConfig = rc.pipeline
    t0 = time.time()

    # localCheckpoint: these are read several times below, and
    # block_keys/clusters ARE overwritten at commit time — no
    # downstream plan may reference files a rename replaces. With the
    # Iceberg backend the barrier is free — readers pin a snapshot.
    old_mentions = _read_with_deltas(spark, catalog, "mentions").localCheckpoint(
        eager=True
    )
    old_keys = catalog.read(spark, "block_keys").localCheckpoint(eager=True)
    if catalog.exists("scored_pairs_all"):
        old_scored = catalog.read(spark, "scored_pairs_all")
    else:  # chunked runner pass: union the chunks
        chunk_dirs = sorted(
            os.path.join(catalog.root, d)
            for d in os.listdir(catalog.root)
            if d.startswith("scored_chunk_")
        )
        old_scored = spark.read.parquet(*chunk_dirs)
    for d in _delta_names(catalog, "scored_pairs"):
        old_scored = old_scored.unionByName(catalog.read(spark, d))
    old_scored = old_scored.localCheckpoint(eager=True)

    # 1. new mentions (urls not yet ingested)
    new_mentions = mentions_stage(new_pages, cfg).join(
        old_mentions.select("url").distinct(), on="url", how="left_anti"
    ).localCheckpoint(eager=True)

    # 2. persisted models only — a delta must NEVER refit (§4.4):
    # delta vectors from a different model would be incomparable with
    # the committed mentions_vec. Missing artifacts are a hard error.
    mdir = _models_dir(catalog, rc)
    if not os.path.exists(os.path.join(mdir, "tfidf", "meta.json")):
        raise FileNotFoundError(
            f"incremental_update requires persisted TF-IDF artifacts under "
            f"{mdir!r} (run the batch pipeline first, or pass rc.model_dir / "
            f"the rc.run_id that fitted them) — refitting on a delta would "
            f"silently break vector comparability"
        )
    if cfg.use_topics and not os.path.exists(os.path.join(mdir, "topics", "lda")):
        raise FileNotFoundError(
            f"incremental_update requires the persisted LDA artifact under "
            f"{mdir!r} when cfg.use_topics is set — refitting on a delta "
            f"would drift topic buckets"
        )
    tfidf, topics = _fit_or_load_models(spark, new_mentions, catalog, rc)
    new_vec = tfidf.transform(new_mentions, "context", "tfidf")
    topic_buckets = None
    if topics is not None:
        new_vec = topics.transform(new_vec, "context", "topic_vec")
        topic_buckets = topics.bucket_keys(new_vec)
    new_vec = new_vec.localCheckpoint(eager=True)
    old_vec = _read_with_deltas(spark, catalog, "mentions_vec").localCheckpoint(
        eager=True
    )
    all_vec = old_vec.unionByName(new_vec)

    # 3. combined block keys, RE-CAPPED, restricted to touched blocks
    new_keys, _ = block_stage(new_mentions, cfg, topic_buckets)
    new_keys = new_keys.localCheckpoint(eager=True)
    combined_raw = old_keys.unionByName(new_keys)
    if cfg.block_skew == "salt":
        combined_keys, _ = blocking.salt_blocks(combined_raw, cfg.cap_k)
    else:
        combined_keys, _ = blocking.cap_blocks(combined_raw, cfg.cap_k)
    combined_keys = combined_keys.localCheckpoint(eager=True)
    # untouched blocks have the exact member set the committed run
    # had (the re-cap retention order is a pure function of
    # (block_key, mention_id)), so every pair they can generate is
    # already in old_scored — the self-join input is the touched
    # subset only, which scales with the delta, not the corpus
    touched = new_keys.select("strategy", "block_key").distinct()
    touched_keys = combined_keys.join(
        touched, on=["strategy", "block_key"], how="left_semi"
    ).localCheckpoint(eager=True)
    all_pairs = blocking.candidate_pairs(touched_keys)

    # 4. delta scoring only (anti-join on the scored pair ids)
    done = old_scored.select("a_id", "b_id")
    delta_pairs = all_pairs.join(done, on=["a_id", "b_id"], how="left_anti")
    # materialize once: the scoring plan (Arrow UDF) would otherwise
    # be re-evaluated by the commit, the CC checkpoint, and the count
    delta_scored = score_pairs(delta_pairs, all_vec, cfg.scoring).localCheckpoint(
        eager=True
    )

    # 5. merge + recluster over the full edge set
    all_scored = old_scored.unionByName(delta_scored)
    all_mentions = old_mentions.unionByName(new_mentions)
    edges = matched_edges(all_scored)
    clusters = clusters_of(all_mentions, edges)

    # 6. commit: APPEND-ONLY deltas for the corpus-sized tables
    # (mentions / mentions_vec / scored pairs — each batch writes only
    # its delta, so commit I/O scales with the delta, not the corpus);
    # block_keys (bounded per-mention key strings, re-capped per
    # batch) and clusters (global CC output — ids can change
    # corpus-wide on any merge) are the two rewrites, both removable
    # with Iceberg row-level replace / MOR when the jar is present.
    n_new = new_mentions.count()
    n_delta = delta_scored.count()
    if n_new:
        catalog.write(new_mentions, _next_delta(catalog, "mentions"),
                      run_id=rc.run_id, stage="mentions")
        catalog.write(new_vec, _next_delta(catalog, "mentions_vec"),
                      run_id=rc.run_id, stage="mentions_vec")
    if n_delta:
        catalog.write(delta_scored, _next_delta(catalog, "scored_pairs"),
                      run_id=rc.run_id, stage="scored_pairs")
    catalog.write(combined_keys, "block_keys", run_id=rc.run_id,
                  stage="block_keys", partition_by=["strategy"])
    m_clusters = catalog.write(clusters, "clusters", run_id=rc.run_id,
                               stage="clusters")

    return {
        "report": {
            "new_mentions": n_new,
            "delta_pairs_scored": n_delta,
            "total_pairs": old_scored.count() + n_delta,
            "total_mentions": m_clusters["total_rows"],
            # scale diagnostics: the pair self-join's input must track
            # the delta, not the corpus (asserted in tests)
            "combined_key_rows": combined_keys.count(),
            "touched_key_rows": touched_keys.count(),
            "touched_blocks": touched.count(),
            "wall_sec": round(time.time() - t0, 2),
        },
        "clusters": catalog.read(spark, "clusters"),
    }
