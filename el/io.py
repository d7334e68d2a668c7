"""Testdata loading helpers (driver tables, FIXTURES.md §B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Explicit path, columnar scan;
    Catalyst handles predicate pushdown / column pruning downstream."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scatter_small(df: DataFrame) -> DataFrame:
    """Adaptive parallelism floor for per-row Python kernel inputs.

    A small parquet table is one file with one row group, so the scan
    yields ONE split and a mapInPandas kernel runs in ONE task — a
    6000-doc bench input leaves 31 of 32 cores idle (measured: dd2's
    band-key stage was 3x its kernel time for exactly this reason).
    Repartition up to the session default parallelism ONLY when the
    input is under-partitioned; at production scale scans arrive with
    thousands of splits and this is a no-op — no extra shuffle is ever
    added to a well-partitioned input. (AQE cannot help here: it only
    re-plans AFTER a shuffle, and the kernel runs before any.)"""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
