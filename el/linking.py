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


def entity_relatedness(edges: DataFrame) -> DataFrame:
    """Inlink-set relatedness components for entity pairs — the
    semantic-relatedness signal collective entity linking votes with
    `[PK: Milne & Witten 2008 normalized link distance; the Jaccard
    inlink overlap used as its standard transcendental-free baseline
    in entity-coherence work]`.

    ``edges`` is a (src, dst) link graph (``el.extract.extract_links``
    host edges: src = linking host, dst = entity host).  Two entities
    are related in proportion to how much their IN-link sets overlap.
    Returns one row per unordered entity pair sharing at least one
    in-link: ``(entity_a, entity_b, n_common, n_union)`` with
    entity_a < entity_b and Jaccard = n_common / n_union left to the
    caller — keeping the components INTEGER keeps every downstream
    vote integer-exact (vote_rerank's fixed-point discipline).

    Plan shape: distinct postings -> one self-equi-join on the src
    host (co-citation join; never a cartesian) -> pair hash aggregate
    + two in-degree joins. Output is bounded by co-citation density,
    not by |entities|^2 — pairs with zero common in-links never
    materialize (they contribute exactly 0 votes downstream)."""
    post = edges.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).distinct()
    deg = post.groupBy("dst").agg(F.count("*").cast("long").alias("_deg"))
    a = post.select(F.col("src"), F.col("dst").alias("entity_a"))
    b = post.select(F.col("src"), F.col("dst").alias("entity_b"))
    common = (
        a.join(b, on="src")
        .where(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        common.join(
            deg.select(F.col("dst").alias("entity_a"), F.col("_deg").alias("_da")),
            on="entity_a",
        )
        .join(
            deg.select(F.col("dst").alias("entity_b"), F.col("_deg").alias("_db")),
            on="entity_b",
        )
        .select(
            "entity_a",
            "entity_b",
            "n_common",
            (F.col("_da") + F.col("_db") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
        )
    )


def vote_rerank(
    candidates: DataFrame,
    relatedness: DataFrame,
    doc_col: str = "doc",
    id_col: str = "mention_id",
    k: int = 1,
    scale: int = 10**9,
) -> DataFrame:
    """Collective (document-level) candidate re-ranking by TAGME
    voting `[PK: Ferragina & Scaiella, "TAGME: on-the-fly annotation
    of short text fragments", CIKM 2010 — each mention's candidates
    are scored by votes from every OTHER mention in the same
    document; a vote is the voter's prior-weighted average
    relatedness to the target candidate]`: the third classic linking
    signal after the commonness prior (el1) and mention-local context
    (el2) — it disambiguates by COHERENCE, preferring the candidate
    set that hangs together as one topic, which is exactly the
    "topic-model disambiguation" role in the north star.

    For target candidate (m, e) in document d:

      vote(m, e) = sum over mentions m' != m in d, candidates e' of
        m':  rel(e, e') * prior(e' | m') / n_cand(m')

    computed ENTIRELY in fixed-point integer arithmetic so the score
    is hash-exact across engines and partitionings (the el3
    cross-multiply discipline, extended to sums):

      contribution = (n_common * n_links' * scale)
                       DIV (n_union * alias_total' * n_cand(m'))

    with rel = inlink Jaccard (n_common/n_union from
    entity_relatedness), prior = n_links'/alias_total', all BIGINT;
    entity pairs without a relatedness row contribute exactly 0.
    Each per-(voter, target) quantization error is < 1/scale, so with
    the default scale the integer vote order only deviates from the
    real-valued one inside ties narrower than n_voters/1e9 — and the
    deterministic entity tie-break resolves those identically
    everywhere.

    ``candidates`` needs (doc_col, id_col, entity, n_links,
    alias_total) — link_by_prior output joined to its mention's
    document. Returns (doc, mention_id, entity, vote_score,
    vote_rank) with vote_score the scaled BIGINT sum, ranked per
    mention by (vote DESC, entity).

    Scale shape: one per-mention candidate count (hash agg), one
    within-document voter x target equi-join (quadratic ONLY in
    candidates-per-document — TAGME bounds mentions per fragment and
    candidates per mention, and callers cap with link_by_prior's k
    and el3's prune), one broadcast-able relatedness join (bounded by
    co-citation density), one final (mention, entity) hash aggregate
    reusing the mention key. Overflow bound: n_common * n_links' *
    scale must fit int64 — at the default 1e9 that allows
    n_common * n_links' up to ~9.2e9, far past any per-host counts;
    rescale down (or move to DECIMAL) for extreme graphs."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    c = candidates.select(
        F.col(doc_col).alias("_doc"),
        F.col(id_col).alias("mention_id"),
        F.col("entity"),
        F.col("n_links").cast("long").alias("_nl"),
        F.col("alias_total").cast("long").alias("_at"),
    )
    ncand = c.groupBy("mention_id").agg(
        F.count("*").cast("long").alias("_nc_m")
    )
    voters = c.join(ncand, on="mention_id").select(
        F.col("_doc"),
        F.col("mention_id").alias("_voter_m"),
        F.col("entity").alias("_voter_e"),
        "_nl",
        "_at",
        "_nc_m",
    )
    targets = c.select("_doc", "mention_id", "entity")
    pairs = targets.join(voters, on="_doc").where(
        F.col("mention_id") != F.col("_voter_m")
    )
    rel = relatedness.select(
        F.col("entity_a"), F.col("entity_b"), F.col("n_common"),
        F.col("n_union"),
    )
    joined = pairs.join(
        F.broadcast(rel),
        (F.least("entity", "_voter_e") == F.col("entity_a"))
        & (F.greatest("entity", "_voter_e") == F.col("entity_b")),
        "left",
    )
    # rel(e, e) = 1 by definition: a voter candidate IDENTICAL to the
    # target entity votes with full relatedness (TAGME's same-entity
    # reinforcement — two mentions plausibly naming the same entity
    # support each other); distinct pairs take Jaccard from the
    # relatedness row, absent rows contribute exactly 0
    joined = joined.withColumn(
        "_contrib",
        F.expr(
            f"CASE WHEN entity = _voter_e "
            f"THEN (_nl * CAST({int(scale)} AS BIGINT)) DIV (_at * _nc_m) "
            f"WHEN n_common IS NOT NULL "
            f"THEN (n_common * _nl * CAST({int(scale)} AS BIGINT)) "
            f"DIV (n_union * _at * _nc_m) ELSE CAST(0 AS BIGINT) END"
        ),
    )
    votes = joined.groupBy("_doc", "mention_id", "entity").agg(
        F.sum("_contrib").cast("long").alias("vote_score")
    )
    w = Window.partitionBy("mention_id").orderBy(
        F.col("vote_score").desc(), F.col("entity")
    )
    return (
        votes.withColumn("vote_rank", F.row_number().over(w))
        .where(F.col("vote_rank") <= k)
        .select(
            F.col("_doc").alias("doc"),
            "mention_id",
            "entity",
            "vote_score",
            "vote_rank",
        )
    )
