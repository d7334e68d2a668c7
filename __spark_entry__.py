"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in the ``el`` package; this module is
a thin adapter over ``el.queries.REGISTRY`` (relational / operator
checks) and ``el.pipeline`` (the flagship entity-resolution run).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from el.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end entity-resolution pipeline on a
    deterministic synthetic web_pages corpus (sf0.001-scale), returning
    the cluster table. Falls back to a relational flagship if the
    pipeline import is unavailable mid-build."""
    try:
        from el.flagship import flagship

        return flagship(spark, "/root/testdata/sf0.001")
    except ImportError:
        return REGISTRY["a1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: c.fn for name, c in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: c.oracle for name, c in REGISTRY.items() if c.oracle is not None
    }
