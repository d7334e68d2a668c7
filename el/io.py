"""Testdata loading helpers (driver tables, FIXTURES.md §B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Explicit path, columnar scan;
    Catalyst handles predicate pushdown / column pruning downstream."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
