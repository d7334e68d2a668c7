#!/usr/bin/env python
"""spark-submit entry point for the entity-resolution pipeline
(BASELINE.json north_rule deployment shape:
``spark-submit --py-files el.zip jobs/run_pipeline.py``).

Runs the checkpointed pipeline on the deterministic synthetic
web_pages corpus, commits every stage to the parquet+manifest catalog
under --out, prints ONE JSON line with per-stage rows/wall plus
throughput, and (with --evaluate) the pairwise F1 gate numbers.

Examples:
  python jobs/run_pipeline.py --pages 1200 --out /tmp/el_run
  spark-submit --master local[8] --py-files el.zip \
      jobs/run_pipeline.py --pages 6000 --out /tmp/el_run8
  python jobs/run_pipeline.py --out /tmp/el_run --resume   # crash resume
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1200)
    ap.add_argument("--out", required=True, help="catalog root directory")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-lsh", action="store_true")
    ap.add_argument("--no-topics", action="store_true")
    ap.add_argument("--score-chunks", type=int, default=8)
    ap.add_argument("--model-dir", default=None,
                    help="shared TF-IDF/LDA artifact dir (fit-once)")
    ap.add_argument("--evaluate", action="store_true",
                    help="compute pairwise P/R/F1 against fixture labels")
    # crawl-hygiene ingest gate (off by default; production crawls)
    ap.add_argument("--canonical-url-dedup", action="store_true",
                    help="dedup recrawls by canonicalize_url(url)")
    ap.add_argument("--min-distinct-word-ratio", type=float, default=None)
    ap.add_argument("--max-dup-2gram", type=float, default=None)
    ap.add_argument("--master", default=None,
                    help="override master (else spark-submit's, else local)")
    args = ap.parse_args()

    from el.catalog import HadoopParquetCatalog
    from el.conf import get_spark
    from el.fixtures import gen_labeled_pairs, gen_web_pages
    from el.pipeline import PipelineConfig
    from el.runner import RunConfig, run_checkpointed

    spark = get_spark(
        "el-run_pipeline",
        master=args.master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig(
        use_lsh=not args.no_lsh,
        use_topics=not args.no_topics,
        canonical_url_dedup=args.canonical_url_dedup,
        min_distinct_word_ratio=args.min_distinct_word_ratio,
        max_dup_2gram=args.max_dup_2gram,
    )
    rc = RunConfig(
        run_id=args.run_id,
        n_score_chunks=args.score_chunks,
        pipeline=cfg,
        model_dir=args.model_dir,
    )
    catalog = HadoopParquetCatalog(args.out)

    t0 = time.time()
    pages = gen_web_pages(spark, args.pages)
    out = run_checkpointed(spark, pages, catalog, rc, resume=args.resume)
    wall = time.time() - t0

    result = {
        "pages": args.pages,
        "run_id": args.run_id,
        "resumed": args.resume,
        "wall_sec": round(wall, 2),
        "stages": out["report"],
        "n_clusters": out["clusters"].select("cluster_id").distinct().count(),
        "pairs_per_sec": round(
            out["report"]["scored_pairs"]["rows"]
            / max(out["report"]["scored_pairs"]["wall_ms"] / 1000.0, 1e-9),
            1,
        ),
    }
    if args.evaluate:
        from el.evaluate import pairwise_scores, primary_clusters

        labeled = gen_labeled_pairs(spark, args.pages)
        uc = primary_clusters(out["clusters"], out["mentions"])
        result["eval"] = pairwise_scores(labeled, uc)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
