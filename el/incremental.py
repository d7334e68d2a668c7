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
6. commit updated mentions / block_keys / scored / clusters tables.

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

    # Old tables are read AND overwritten below: materialize them
    # (localCheckpoint) so no downstream plan references files the
    # commit rename replaces. With the Iceberg backend this is free —
    # readers pin a snapshot while the commit creates a new one.
    old_mentions = catalog.read(spark, "mentions").localCheckpoint(eager=True)
    old_keys = catalog.read(spark, "block_keys").localCheckpoint(eager=True)
    if catalog.exists("scored_pairs_all"):
        old_scored = catalog.read(spark, "scored_pairs_all")
    else:  # first delta after a chunked runner pass: union the chunks
        chunk_dirs = sorted(
            os.path.join(catalog.root, d)
            for d in os.listdir(catalog.root)
            if d.startswith("scored_chunk_")
        )
        old_scored = spark.read.parquet(*chunk_dirs)
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
    old_vec = catalog.read(spark, "mentions_vec").localCheckpoint(eager=True)
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

    # 6. commit the updated world
    catalog.write(all_mentions, "mentions", run_id=rc.run_id, stage="mentions")
    catalog.write(all_vec, "mentions_vec", run_id=rc.run_id,
                  stage="mentions_vec")
    catalog.write(combined_keys, "block_keys", run_id=rc.run_id,
                  stage="block_keys", partition_by=["strategy"])
    m_scored = catalog.write(all_scored, "scored_pairs_all",
                             run_id=rc.run_id, stage="scored_pairs")
    m_clusters = catalog.write(clusters, "clusters", run_id=rc.run_id,
                               stage="clusters")

    n_delta = delta_scored.count()
    return {
        "report": {
            "new_mentions": new_mentions.count(),
            "delta_pairs_scored": n_delta,
            "total_pairs": m_scored["total_rows"],
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
