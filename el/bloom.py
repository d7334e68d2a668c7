"""Bloom-filter prune join: shrink a huge probe side before a shuffle.

The web-scale join shape this serves: a ~100 TB fact/pages table must
be joined to a "medium" key set — too many rows to broadcast as a
hash-join build side, but whose *bit set* fits in a few MiB.  Sending
the full probe side into the shuffle join moves almost entirely rows
that will not match; a Bloom pre-filter drops them at the scan, so
shuffle volume is proportional to (matches + false positives) instead
of the full table.

Spark's AQE can inject runtime bloom filters for plain joins
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
makes the pattern explicit and composable where the optimizer cannot
see it — e.g. pruning *before* a Python-UDF scoring stage, or against
a key set produced mid-pipeline.

Guarantees: the filter has NO false negatives by construction (every
build key sets its k bits; a probe row with those bits unset cannot
be a match).  False positives pass the pre-filter and are removed by
the exact semi-join that follows (``verify=True``, the default), so
the operator's *result* is exactly a semi-join — DuckDB-oracled as
such (j9) — while its *plan* moves only the pruned row set.

Mechanics, all deterministic:
- k bit positions per key are computed JVM-side on BOTH sides with
  the same expression, ``pmod(xxhash64(lit(i), key), num_bits)`` —
  no Python hashing, so build/probe can never disagree.
- the build side reduces to DISTINCT positions (bounded by num_bits,
  never by key count) before the driver materialises the bitmap; the
  driver collect is therefore capped at num_bits/8 bytes of state
  regardless of data scale.
- the probe is one Arrow-batched pandas UDF doing a vectorized bitmap
  gather — the only Python in the plan, O(k) loads per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _positions(col: str, num_bits: int, k: int) -> list:
    return [
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(num_bits)).cast("long")
        for i in range(k)
    ]


def build_bloom(keys: DataFrame, key_col: str, num_bits: int, k: int) -> bytes:
    """Distributed build: per-key positions -> distinct -> bitmap.

    The collect is bounded by num_bits distinct positions (8 B each),
    not by |keys| — a 2^23-bit filter costs at most 64 MiB of driver
    traffic once, then 1 MiB broadcast."""
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    pos = (
        keys.select(F.explode(F.array(*_positions(key_col, num_bits, k))).alias("p"))
        .distinct()
        .collect()
    )
    bm = np.zeros(num_bits // 8, dtype=np.uint8)
    arr = np.fromiter((r["p"] for r in pos), dtype=np.int64, count=len(pos))
    np.bitwise_or.at(bm, arr >> 3, (1 << (arr & 7)).astype(np.uint8))
    return bm.tobytes()


def bloom_prune(
    probe: DataFrame,
    keys: DataFrame,
    on: str,
    num_bits: int = 1 << 23,
    k: int = 5,
) -> DataFrame:
    """Keep probe rows whose key MIGHT be in keys (no false negatives)."""
    spark = probe.sparkSession
    # hash the SAME type on both sides: xxhash64(5L) != xxhash64('5'),
    # so a build/probe type mismatch would silently prune true matches
    # (the equi-join's implicit cast would have matched them). Coerce
    # the build keys to the probe column's type before hashing.
    probe_type = probe.schema[on].dataType
    keys = keys.select(F.col(on).cast(probe_type).alias(on))
    bcast = spark.sparkContext.broadcast(build_bloom(keys, on, num_bits, k))

    @F.pandas_udf(T.BooleanType())
    def _member(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:  # empty Arrow batch: (0,) array has no axis 1
            return pd.Series([], dtype=bool)
        bm = np.frombuffer(bcast.value, dtype=np.uint8)
        arr = np.asarray(pos.tolist(), dtype=np.int64)  # (rows, k)
        hit = (bm[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    # asNondeterministic stops InferFiltersFromConstraints from
    # duplicating the probe filter through the verify equi-join onto
    # the BUILD side (a redundant Arrow pass over every build key —
    # caught by the j9 plan audit; the lk1 JW UDF needed the same).
    member = _member.asNondeterministic()

    return probe.where(
        member(F.array(*_positions(on, num_bits, k)))
    )


def bloom_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    on: str,
    num_bits: int = 1 << 23,
    k: int = 5,
    verify: bool = True,
) -> DataFrame:
    """Exact semi-join whose shuffle input is Bloom-pruned first.

    verify=False returns the raw pruned set (superset of the semi-
    join; false-positive rate ~ (1 - e^{-k n / m})^k) for callers that
    tolerate approximation and want zero shuffle."""
    pruned = bloom_prune(probe, keys, on, num_bits, k)
    if not verify:
        return pruned
    return pruned.join(keys.select(on).distinct(), on=on, how="left_semi")
