"""Two-table record linkage (the reference's namesake capability,
SURVEY.md §0: record-linkage / entity-resolution — here as a generic
left-table-to-right-table fuzzy join, complementing the single-table
self-dedup ops in el.dedup).

Plan shape (scale-first, BASELINE.json north_star "salted multi-key
blocking ... skew-aware hash joins"):

  normalize both names -> derive block key(s) -> equi-join the two
  sides on the block key (shuffle hash/SMJ, linear in block volume,
  never a cross join) -> distinct candidate pairs -> one vectorized
  Jaro-Winkler verify pass (el.simfn numpy kernel, one Arrow batch
  boundary) -> threshold filter.

At 100 TB neither side is broadcastable; the equi-join shuffles both
sides on the block key only, candidate volume is bounded by the
per-block cap (cap_k, same W1 discipline as el.blocking.cap_blocks),
and the Python kernel sees only distinct surviving candidates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_name(col: Column) -> Column:
    """F1 normalization, bit-parity with the DuckDB oracle form
    ``trim(regexp_replace(lower(x), '[^a-z0-9 ]', '', 'g'))``."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", ""))


def _block_keys(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_tokens: int,
    prefix_len: int,
    explode_all: bool,
    block_on: list[str] | None,
) -> DataFrame:
    """(id, norm, block_key) rows. Default: ONE structured key per
    record — any exact-match ``block_on`` attribute values plus the
    first ``min(block_tokens, available)`` tokens' ``prefix_len``-char
    prefixes (typo-tolerant leading-token key), '|'-joined; a
    single-token name still gets a key (only empty names drop).
    ``explode_all=True`` is the recall-oriented multi-key variant:
    every token >= 3 chars emits a key (el.blocking name_token
    style — names whose tokens are all shorter emit none), at the
    cost of more candidates."""
    extras = [F.col(c).cast("string") for c in (block_on or [])]
    norm = normalize_name(F.col(name_col)).alias("norm")
    toks = F.split(F.col("norm"), " +")
    base = df.select(F.col(id_col).alias("rid"), norm, *extras)
    for c in block_on or []:
        # equi-join semantics: a NULL block attribute matches nothing
        # (concat_ws would silently fold NULL to '' otherwise)
        base = base.where(F.col(c).isNotNull())
    extra_cols = [F.col(c) for c in (block_on or [])]
    if explode_all:
        return (
            base.select(
                "rid",
                "norm",
                *extra_cols,
                F.explode(toks).alias("tok"),
            )
            .where(F.length("tok") >= 3)
            .select(
                "rid",
                "norm",
                F.concat_ws(
                    "|", *extra_cols, F.substring("tok", 1, prefix_len)
                ).alias("block_key"),
            )
            .dropDuplicates(["rid", "block_key"])
        )
    return base.where(F.length("norm") > 0).select(
        "rid",
        "norm",
        F.concat_ws(
            "|",
            *extra_cols,
            F.array_join(
                F.transform(
                    F.slice(toks, 1, block_tokens),
                    lambda t: F.substring(t, 1, prefix_len),
                ),
                " ",
            ),
        ).alias("block_key"),
    )


def _cap_side(keys: DataFrame, cap_k: int | None) -> DataFrame:
    """W1 discipline per side: bound any block at cap_k members, kept
    in a block-dependent deterministic order (hot records capped in
    one block still surface via their other keys when explode_all)."""
    if cap_k is None:
        return keys
    w = Window.partitionBy("block_key").orderBy(
        F.xxhash64("block_key", "rid"), F.col("rid")
    )
    return (
        keys.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap_k)
        .drop("_rn")
    )


def link_tables(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    threshold: float = 0.9,
    block_tokens: int = 2,
    prefix_len: int = 4,
    explode_all: bool = False,
    cap_k: int | None = None,
    block_on: tuple[list[str] | None, list[str] | None] = (None, None),
) -> DataFrame:
    """Fuzzy-link two tables on a name column. ``block_on`` optionally
    names exact-match structured attributes per side (the classic ER
    pattern: block on e.g. (brand, size) exactly, verify the name
    fuzzily); both sides' lists must be same-length and type-aligned.
    Returns one row per linked pair: ``(l_id, r_id, jw)`` with ``jw``
    the Jaro-Winkler similarity of the normalized names, rounded to 4
    (the el.simfn kernel is round(4)-parity with DuckDB's
    jaro_winkler_similarity, pinned by the f5 oracle), kept where
    ``jw >= threshold``."""
    from el.simfn import jaro_winkler

    lk = _cap_side(
        _block_keys(left, left_id, left_name, block_tokens, prefix_len,
                    explode_all, block_on[0]),
        cap_k,
    )
    rk = _cap_side(
        _block_keys(right, right_id, right_name, block_tokens, prefix_len,
                    explode_all, block_on[1]),
        cap_k,
    )
    cands = (
        lk.alias("l")
        .join(rk.alias("r"), on="block_key")
        .select(
            F.col("l.rid").alias("l_id"),
            F.col("r.rid").alias("r_id"),
            F.col("l.norm").alias("norm_l"),
            F.col("r.norm").alias("norm_r"),
        )
        .dropDuplicates(["l_id", "r_id"])
    )

    @F.pandas_udf("double")
    def jw_udf(a, b):
        return pd.Series(
            jaro_winkler(a.fillna("").tolist(), b.fillna("").tolist())
        )

    # The kernel is pure; the marker is an optimizer fence — without
    # it Catalyst pushes the threshold filter below the projection and
    # duplicates the UDF (two ArrowEvalPython passes over every
    # candidate, plan-audited in test_plans.py).
    jw_udf = jw_udf.asNondeterministic()

    return (
        cands.select(
            "l_id",
            "r_id",
            F.round(jw_udf("norm_l", "norm_r"), 4).alias("jw"),
        )
        .where(F.col("jw") >= threshold)
    )
