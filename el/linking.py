"""Mention -> catalog entity linking (el1 alias-commonness prior,
el2 context re-rank, el3 NIL-aware resolution).

The flagship pipeline (el.pipeline) RESOLVES mentions against each
other into clusters; this module LINKS surface mentions to a catalog
of known entities — the complementary half of web-scale entity
linking (BASELINE.json north_star is literally "entity-linking"),
built from the two classic public-literature signals:

- **commonness prior** P(entity | alias): the fraction of anchor
  links carrying surface form ``alias`` that point at ``entity``
  (Milne & Witten 2008, "Learning to Link with Wikipedia"; TAGME,
  Ferragina & Scaiella 2010).  The evidence table is exactly
  ``el.extract.anchor_alias_stats`` output — one crawl-scale hash
  aggregate, tiny thereafter (bounded by distinct (alias, entity)
  pairs), so the prior side of every linking join is broadcast-able.
- **context compatibility**: exact JVM cosine (el.dedup.cosine_expr —
  the ann1/dd5b kernel) between the mention document's embedding and
  the candidate entity's profile vector, re-ranking prior candidates
  when an alias is ambiguous ("paris" the city vs the person).

Scale shape at 10^12 mentions: the entity/alias catalog is the SMALL
side (millions of rows vs trillions of mentions), so ``link_by_prior``
and ``rerank_by_context`` broadcast the catalog side; the only wide
exchange is the mention-keyed hash join between candidates and their
context vectors, followed by a per-mention window over at most
``max_candidates`` rows (row_number + rank<=k, the W1/W2
WindowGroupLimit shape — the limit pushes below the sort).

Determinism: ranking inside an alias orders by the INTEGER link count
(equivalent to prior order — same denominator) with an entity-id tie
break, so prior ranks never depend on float comparisons; context
ranks order by the exact per-row cosine double (bit-identical across
engines and partitionings — the ann1-proven regime) with the same
entity tie break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from el.dedup import cosine_expr


def normalize_surface(col: Column) -> Column:
    """Mention-surface normalization, bit-parity with the alias
    normalization inside ``el.extract.anchor_alias_stats`` (lowercase,
    collapse internal whitespace, trim) — a mention links iff its
    normalized surface equals a normalized anchor alias."""
    return F.lower(F.trim(F.regexp_replace(col, "\\s+", " ")))


def alias_prior(
    stats: DataFrame,
    alias_col: str = "alias",
    entity_col: str = "dst_host",
    weight_col: str = "n_links",
) -> DataFrame:
    """Commonness-prior table from alias evidence: ``(alias, entity,
    n_links, alias_total, prior)`` with ``prior = n_links /
    alias_total`` (one per-row double division — exact-integer inputs,
    so both engines produce the identical IEEE double).

    The window sum runs over the already-aggregated evidence table
    (cardinality = distinct (alias, entity) pairs — the catalog, not
    the crawl), partitioned by alias; at 100 TB this is a
    catalog-side-only pass, never a corpus shuffle."""
    w = Window.partitionBy("alias")
    out = stats.select(
        F.col(alias_col).alias("alias"),
        F.col(entity_col).alias("entity"),
        F.col(weight_col).cast("long").alias("n_links"),
    )
    out = out.withColumn("alias_total", F.sum("n_links").over(w))
    return out.withColumn(
        "prior", F.col("n_links") / F.col("alias_total")
    )


def link_by_prior(
    mentions: DataFrame,
    prior: DataFrame,
    surface_col: str = "surface",
    id_col: str = "mention_id",
    k: int = 1,
    min_links: int = 1,
    broadcast_prior: bool = True,
) -> DataFrame:
    """Top-``k`` candidate entities per mention by commonness prior:
    normalize the surface, equi-join it against the prior table
    (broadcast by default — the catalog side), rank candidates by
    link count (== prior order within an alias; integer, no float
    comparisons) with an entity-id tie break.

    Returns ``(mention_id, alias, entity, n_links, alias_total,
    prior, rank)``.  INNER-join semantics: a mention whose normalized
    surface has no alias evidence yields no row (the unlinked set is
    the caller's left-anti against this output — same NULL/absence
    discipline as el.linkage block keys).  ``min_links`` drops
    one-off anchor typos from the candidate set before ranking."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = mentions.select(
        F.col(id_col).alias("mention_id"),
        normalize_surface(F.col(surface_col)).alias("_alias"),
    ).where(F.col("_alias").isNotNull() & (F.col("_alias") != ""))
    p = prior.where(F.col("n_links") >= int(min_links))
    if broadcast_prior:
        p = F.broadcast(p)
    cand = m.join(p, m["_alias"] == p["alias"], "inner")
    w = Window.partitionBy("mention_id").orderBy(
        F.col("n_links").desc(), F.col("entity")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "mention_id",
            "alias",
            "entity",
            "n_links",
            "alias_total",
            "prior",
            "rank",
        )
    )


def entity_profiles(
    vecs: DataFrame,
    entity_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "exemplar",
    dim: int = 64,
) -> DataFrame:
    """Entity profile vectors ``(entity, profile)`` for context
    re-ranking, from a table of per-document vectors tagged with the
    entity they describe.

    ``method="exemplar"``: the vector of the smallest ``id_col`` per
    entity — deterministic and exact (integer argmin), so a SQL
    oracle reproduces it bit-for-bit: the oracle regime.
    ``method="centroid"``: the element-wise mean via
    ``el.similarity.grouped_centroid_jvm`` (map-side partial agg, the
    a4b scale path) — the production regime; cross-engine float
    AGGREGATION is not bit-stable, so the centroid path is pinned by
    pytest rather than the driver's hash-exact oracle (the same
    regime split as dd5b prod-vs-oracle configs)."""
    if method == "exemplar":
        w = Window.partitionBy("entity").orderBy("_id")
        return (
            vecs.select(
                F.col(entity_col).alias("entity"),
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("profile"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("entity", "profile")
        )
    if method == "centroid":
        from el.similarity import grouped_centroid_jvm

        c = grouped_centroid_jvm(
            vecs.select(
                F.col(entity_col).alias("label"),
                F.col(vec_col).alias("embedding"),
            ),
            dim=dim,
        )
        return c.select(
            F.col("label").alias("entity"), F.col("centroid").alias("profile")
        )
    raise ValueError(f"unknown profile method: {method!r}")


def rerank_by_context(
    candidates: DataFrame,
    contexts: DataFrame,
    profiles: DataFrame,
    k: int = 1,
    id_col: str = "mention_id",
    entity_col: str = "entity",
    vec_col: str = "ctx_vec",
    profile_col: str = "profile",
    broadcast_profiles: bool = True,
) -> DataFrame:
    """Re-rank candidate (mention, entity) rows by context cosine:
    join each candidate to its mention's context vector (hash join on
    mention id — the one wide exchange) and to the entity's profile
    vector (broadcast — catalog side), score with the exact JVM
    cosine, keep the top-``k`` per mention ordered by
    ``(ctx_cos DESC, entity)``.

    Returns the candidate columns plus ``(ctx_cos, ctx_rank)``.
    Candidates whose mention has no context vector or whose entity
    has no profile drop out (inner joins): a context re-rank without
    context is undefined — keep the prior rank instead (callers
    choose by joining back on the prior output)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ctx = contexts.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias("_ctx_vec")
    )
    prof = profiles.select(
        F.col(entity_col).alias(entity_col),
        F.col(profile_col).alias("_profile"),
    )
    if broadcast_profiles:
        prof = F.broadcast(prof)
    scored = (
        candidates.join(ctx, on=id_col, how="inner")
        .join(prof, on=entity_col, how="inner")
        .withColumn(
            "ctx_cos", cosine_expr(F.col("_ctx_vec"), F.col("_profile"))
        )
        .drop("_ctx_vec", "_profile")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("ctx_cos").desc(), F.col(entity_col)
    )
    return (
        scored.withColumn("ctx_rank", F.row_number().over(w))
        .where(F.col("ctx_rank") <= k)
    )


def resolve_links(
    mentions: DataFrame,
    prior: DataFrame,
    surface_col: str = "surface",
    id_col: str = "mention_id",
    tau_num: int = 1,
    tau_den: int = 50,
    min_links: int = 1,
    broadcast_prior: bool = True,
) -> DataFrame:
    """Final linking decision with NIL — the third classic component
    after candidate generation (el1) and disambiguation (el2): a
    mention whose best catalog candidate is not trustworthy must map
    to NIL, never to a forced wrong link (TAGME prunes anchors with
    commonness below a threshold; TAC-KBP scores NIL as a first-class
    answer).

    One row per input mention: ``(mention_id, surface, entity,
    n_links, alias_total, prior, is_nil, nil_reason)`` where
    ``entity``/``n_links``/``alias_total``/``prior`` are NULL iff
    ``is_nil``.  NIL rules, evaluated in order, ALL integer-exact so
    the decision never depends on a float comparison:

    - ``no_evidence``: the normalized surface matches no alias in the
      prior table (left-join miss — el1's inner-join drop, made
      explicit).
    - ``low_prior``: best-candidate prior < tau_num/tau_den, tested
      by integer cross-multiplication ``n_links * tau_den <
      tau_num * alias_total`` (the TAGME epsilon prune; default
      1/50 = 0.02).
    - ``ambiguous``: the top-2 candidates have exactly equal link
      counts — the prior cannot separate them, so don't guess (a
      context signal, when available, breaks such ties via
      rerank_by_context BEFORE this decision; this rule is the
      no-context fallback).

    Scale shape: identical to link_by_prior (broadcast catalog,
    per-mention window over <= 2 rows) plus one mention-keyed left
    join back to the input — the same single wide exchange, reused."""
    cand = link_by_prior(
        mentions,
        prior,
        surface_col=surface_col,
        id_col=id_col,
        k=2,
        min_links=min_links,
        broadcast_prior=broadcast_prior,
    )
    top1 = cand.where(F.col("rank") == 1).select(
        F.col("mention_id"),
        F.col("entity"),
        F.col("n_links"),
        F.col("alias_total"),
        F.col("prior"),
    )
    top2 = cand.where(F.col("rank") == 2).select(
        F.col("mention_id"), F.col("n_links").alias("_n_links2")
    )
    dec = top1.join(top2, on="mention_id", how="left").withColumn(
        "nil_reason",
        F.when(
            F.col("n_links") * F.lit(int(tau_den))
            < F.lit(int(tau_num)) * F.col("alias_total"),
            F.lit("low_prior"),
        ).when(F.col("_n_links2") == F.col("n_links"), F.lit("ambiguous")),
    )
    m = mentions.select(
        F.col(id_col).alias("mention_id"), F.col(surface_col).alias("surface")
    )
    out = m.join(dec.drop("_n_links2"), on="mention_id", how="left")
    nil = F.col("nil_reason").isNotNull() | F.col("entity").isNull()
    return out.select(
        "mention_id",
        "surface",
        *[
            F.when(~nil, F.col(c)).alias(c)
            for c in ("entity", "n_links", "alias_total", "prior")
        ],
        nil.alias("is_nil"),
        F.coalesce(
            F.col("nil_reason"),
            F.when(F.col("entity").isNull(), F.lit("no_evidence")),
        ).alias("nil_reason"),
    )
