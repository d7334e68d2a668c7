#!/usr/bin/env python
"""spark-submit entry point for the entity-LINKING chain (el1 alias
prior -> el3 NIL-aware resolution -> el4 TAC-KBP evaluation) — the
mention-to-catalog half of the engine, complementing
jobs/run_pipeline.py's mention-to-mention resolution.

Synthesizes the deterministic anchor + mention corpora
(el.linkrun), fits the commonness prior from extracted anchor
evidence, resolves every mention to its best entity or NIL, scores
against the planted gold, and prints ONE JSON line.

Examples:
  python jobs/run_linking.py
  python jobs/run_linking.py --links 200000 --mentions 50000
  spark-submit --master local[8] --py-files el.zip jobs/run_linking.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=20000)
    ap.add_argument("--aliases", type=int, default=40)
    ap.add_argument("--mentions", type=int, default=5000)
    ap.add_argument("--tau-num", type=int, default=1)
    ap.add_argument("--tau-den", type=int, default=50)
    ap.add_argument("--master", default=None,
                    help="override master (else spark-submit's, else local)")
    args = ap.parse_args()

    from el.conf import get_spark
    from el.linkrun import run_linking

    spark = get_spark(
        "el-run_linking",
        master=args.master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    result = run_linking(
        spark,
        n_links=args.links,
        n_aliases=args.aliases,
        n_mentions=args.mentions,
        tau_num=args.tau_num,
        tau_den=args.tau_den,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
