"""Training-data set operations (task brief: ops a large-scale
training-data pipeline needs): deterministic train/val/test splitting
and context-window sequence packing.

Both are pure projections/window ops over public-SQL-expressible
primitives, so they carry full DuckDB value-hash oracles (ds1/ds2):

- hash_split assigns each record a split by an md5-derived bucket of
  its key — a pure function of (key, seed). No shuffle, no RNG state,
  stable under corpus growth: a record's split never changes when
  other records are added/removed (the property sample()/rand() lack,
  and the reason leakage-free splits hash the KEY, not the row).
- pack_sequences is concat-then-chunk packing (the GPT/T5-style data
  layout: concatenate documents in a fixed order, slice into
  fixed-size windows): each document's start offset is the running
  token total before it within its partition, and its window/bin is
  start // capacity. One window over (part_col) per partition — at
  100 TB the packing order is per-partition (lang, shard, ...) by
  contract, never a single global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key, seed: str = "", n_buckets: int = 10_000):
    """Deterministic bucket in [0, n_buckets) from md5(key || seed).
    Uses only cross-engine-stable primitives (md5 hex + base-16
    conv), so a SQL oracle can reproduce it bit-for-bit."""
    h = F.conv(F.substring(F.md5(F.concat(key, F.lit(seed))), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each record to a named split
    with the given weights (summing to ~1), keyed on ``key_col`` —
    all records sharing a key land in the same split (dedup-safe:
    split BY the dedup key and near-identical rows cannot straddle
    train/test). Pure projection: the physical plan has no exchange
    (plan-audited)."""
    bucket = hash_bucket(F.col(key_col).cast("string"), seed)
    n = 10_000
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = F.col("_bucket") < int(round(acc * n))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("split", expr)
        .drop("_bucket")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Concat-then-chunk packing: within each ``part_col`` partition,
    documents are laid out in (order_col, then order_col ties by that
    column only — pass a unique column) order; each document gets
    ``start`` = running token total before it, ``bin_id`` =
    start // capacity and ``bin_offset`` = start % capacity. A
    document may straddle a window boundary — that is the
    concatenate-and-slice semantics, not first-fit bin packing (which
    is inherently sequential and does not distribute).

    Deterministic: the window order must be total — use a unique
    ``order_col`` (doc_id). Adds start/bin_id/bin_offset."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("start", start)
        # integer `div`, never a double round-trip: exact at any scale
        .withColumn("bin_id", F.expr(f"start div {int(capacity)}"))
        .withColumn(
            "bin_offset", (F.col("start") % capacity).cast("long")
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsample (training-data mixing:
    keep fraction f_s of stratum s, e.g. upweight rare languages by
    keeping all of them while thinning the head).

    Selection is hash-threshold on the KEY, not rand(): a row's
    fate is a pure function of (key, seed), so the sample is stable
    under corpus growth, re-runs, and partitioning — and a SQL oracle
    reproduces it bit-for-bit (ds3). Strata missing from ``fractions``
    are dropped (explicit mixing weights only). Pure filter: no
    shuffle, pushes down past column pruning.

    The hash is namespaced ('strat:' + seed) so sampling is
    INDEPENDENT of ``hash_split`` on the same key at the same seed —
    without the namespace, sample(f=0.5) after split(train=0.8) would
    keep 62.5% of train and 0% of test (the two threshold tests would
    read the same bucket)."""
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    n = 10_000
    expr = None
    for s, f in fractions.items():
        cond = (F.col(strata_col) == s) & (
            F.col("_bucket") < int(round(f * n))
        )
        expr = cond if expr is None else expr | cond
    return (
        df.withColumn(
            "_bucket",
            hash_bucket(F.col(key_col).cast("string"), "strat:" + seed),
        )
        .where(expr)
        .drop("_bucket")
    )


def weighted_mixture(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted corpus mixing with epoching — the
    GPT-3/Pile sampling-weights discipline (sources are repeated or
    thinned so each contributes weight_s x |s| records in
    expectation): a record from source s is emitted floor(w_s) whole
    copies, plus one extra copy iff its hash bucket falls below the
    fractional part of w_s. Every copy carries ``epoch`` (0-based
    repeat index) so downstream ``pack_sequences`` can lay epochs out
    as distinct passes instead of adjacent duplicates.

    The per-record copy count is a pure function of (key, seed) —
    no rand(), no RNG state — so the mixture is bit-stable under
    corpus growth, re-runs, and partitioning, and a SQL oracle
    reproduces it exactly (ds5). Sources absent from ``weights`` get
    weight 0 and are dropped (explicit mixing only, the
    stratified_sample contract). The hash is namespaced
    ('mixw:' + seed) so the fractional-copy coin is independent of
    hash_split / stratified_sample buckets on the same key.

    Scale: pure projection + explode — zero shuffle, no join (the
    weights table is a literal CASE expression, not a dimension
    scan); upweighting multiplies rows at the scan, exactly where a
    100 TB pipeline wants the fan-out (before any wide stage)."""
    if not weights:
        raise ValueError("weights must name at least one source")
    n = 10_000
    copies = None
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}")
        whole = int(w)
        frac_thresh = int(round((w - whole) * n))
        cnt = F.lit(whole) + (F.col("_bucket") < frac_thresh).cast("int")
        cond = F.col(source_col) == s
        copies = (
            F.when(cond, cnt) if copies is None else copies.when(cond, cnt)
        )
    copies = copies.otherwise(F.lit(0))
    epochs = F.when(
        copies > 0,
        F.sequence(F.lit(0).cast("long"), (copies - 1).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn(
            "_bucket",
            hash_bucket(F.col(key_col).cast("string"), "mixw:" + seed),
        )
        .select("*", F.explode(epochs).alias("epoch"))
        .drop("_bucket")
    )


def budget_select(
    df: DataFrame,
    part_col: str,
    quality_col: str,
    token_col: str,
    budget: int,
    tiebreak_col: str,
) -> DataFrame:
    """Quality-ranked token-budget selection (curriculum/data-mixing:
    per group, take the highest-quality documents until a token
    budget is met; the document that crosses the budget line is the
    last one kept — standard greedy prefix).

    One window per group ordered by (quality desc, tiebreak asc) — a
    total order, so selection is deterministic; the running sum is
    over the strictly-preceding rows, hence a doc is kept iff the
    budget was not yet exhausted BEFORE it. At scale this is one
    shuffle on part_col; no global sort."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(quality_col).desc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spent = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("spent_before", spent)
        .where(F.col("spent_before") < budget)
        .withColumn(
            "cum_tokens",
            (F.col("spent_before") + F.col(token_col)).cast("long"),
        )
    )


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training-corpus decontamination against an evaluation benchmark
    (the GPT-3-appendix / CCNet discipline): a training document is
    contaminated when it shares >= ``threshold`` distinct token
    ``n``-grams with ANY benchmark text, because eval answers leaking
    into training data silently inflate benchmark scores.

    Returns one row per non-null-text doc:
    ``(id, n_grams, n_contaminated, contamination_frac, contaminated)``
    where n_grams is the doc's distinct-gram count, n_contaminated the
    count of those grams that appear anywhere in the benchmark, and
    contamination_frac their single-IEEE-division ratio (oracle-
    mirrorable operand order).

    Scale shape: the benchmark side collapses to DISTINCT grams once
    (eval suites are tiny next to a training corpus — broadcast by
    default; pass broadcast_bench=False for a giant benchmark and the
    equi-join shuffles instead). The corpus side is one linear explode
    to (id, gram) postings; the join key is md5(gram), a fixed-width
    32-hex key, so at n=13 the shuffle/broadcast carries digests, not
    ~100-byte gram strings. Per-doc totals come from the pre-explode
    array size — no second pass over the text. Default n=13 matches
    the GPT-3 decontamination spec; fixtures use smaller n so planted
    overlaps actually occur at test scale."""
    from el.dedup import token_ngrams

    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), token_ngrams(F.col(text_col), n).alias("_g")
    )
    totals = base.select(
        id_col, F.size("_g").cast("long").alias("n_grams")
    )
    # explode the md5s, not the grams: generators can't nest inside
    # expressions, and transform() hashes JVM-side before the explode,
    # so gram strings never leave their row
    posts = base.select(
        id_col,
        F.explode(F.transform("_g", F.md5)).alias("_gh"),
    )
    bgrams = (
        bench.where(F.col(bench_text_col).isNotNull())
        .select(
            F.explode(
                F.transform(token_ngrams(F.col(bench_text_col), n), F.md5)
            ).alias("_gh")
        )
        .distinct()
    )
    if broadcast_bench:
        bgrams = F.broadcast(bgrams)
    # grams are distinct per doc (token_ngrams array_distincts), so a
    # plain post-join count(*) is the distinct contaminated-gram count
    hits = posts.join(bgrams, on="_gh").groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_contaminated")
    )
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    frac = n_cont.cast("double") / F.greatest(
        F.col("n_grams"), F.lit(1)
    ).cast("double")
    return totals.join(hits, on=id_col, how="left").select(
        id_col,
        "n_grams",
        n_cont.alias("n_contaminated"),
        frac.alias("contamination_frac"),
        (n_cont >= threshold).alias("contaminated"),
    )


def decontaminated_split(
    docs: DataFrame,
    bench: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    n: int = 13,
    threshold: int = 1,
    text_col: str = "text",
    seed: str = "",
    protect: tuple[str, ...] = ("train",),
    quarantine: str = "quarantine",
) -> DataFrame:
    """Contamination-aware train/val/test split — the composition the
    GPT-3 appendix actually performs: assign every record its
    leakage-safe hash split (``hash_split``), flag records sharing
    token n-grams with the benchmark (``benchmark_contamination``),
    and re-route contaminated records OUT of the protected training
    splits into ``quarantine``. Held-out splits keep contaminated
    records by default (they threaten the EXTERNAL benchmark only if
    trained on); pass ``protect=tuple(weights)`` to quarantine them
    everywhere.

    Records with NULL text carry no grams and are never contaminated.
    Returns ``(key, split, contaminated)``.

    Scale shape: the split is a pure projection (no exchange); the
    contamination side ends in a groupBy on the key, so the final
    left join arrives already partitioned on the key and reuses that
    exchange — the composition adds no shuffle beyond what dc1
    already pays."""
    base = hash_split(docs, key_col, weights, seed=seed).select(
        key_col, "split"
    )
    cont = benchmark_contamination(
        docs,
        bench,
        n=n,
        threshold=threshold,
        text_col=text_col,
        id_col=key_col,
    ).select(key_col, "contaminated")
    joined = base.join(cont, on=key_col, how="left")
    is_cont = F.coalesce(F.col("contaminated"), F.lit(False))
    routed = F.when(
        is_cont & F.col("split").isin(*protect), F.lit(quarantine)
    ).otherwise(F.col("split"))
    return joined.select(
        key_col,
        routed.alias("split"),
        is_cont.alias("contaminated"),
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int = 0,
    n_shards: int = 1024,
    seed: str = "",
) -> DataFrame:
    """Deterministic training-epoch shuffle: a fresh but reproducible
    permutation of the corpus per epoch, laid out as ``(shard, pos)``
    — the physical form a data loader streams (readers pull shards in
    any order; rows within a shard are already permuted, so global
    read order is a valid shuffle without any global sort).

    Both the shard and the within-shard order derive from
    ``md5(key ':' epoch ':' seed)`` — cross-engine-stable primitives
    only (the ds1/ds3 discipline), so a SQL oracle reproduces the
    exact permutation and the shuffle is a pure function of
    (key, epoch, seed): re-runs, retries, and resumes see the same
    order, and bumping ``epoch`` gives an independent permutation.
    This is the property ``orderBy(rand())`` lacks (non-reproducible
    across retries — a task retry mid-epoch would silently re-permute
    its partition) and ``df.sample``/``shuffle`` cannot give at all.

    Scale shape: exactly ONE hash exchange on ``shard`` + a per-shard
    sort (the window is partitioned, never global). Size ``n_shards``
    so a shard's rows fit one task comfortably (corpus_rows /
    n_shards ~ a few hundred MB at 100 TB); pos is dense 0..k-1
    within each shard, so ``(shard, pos)`` ranges shard cleanly into
    fixed-size training files."""
    sk = F.md5(
        F.concat(
            F.col(key_col).cast("string"),
            F.lit(f":{int(epoch)}:{seed}"),
        )
    )
    shard = (
        F.conv(F.substring(sk, 1, 8), 16, 10).cast("long")
        % int(n_shards)
    )
    w = Window.partitionBy("shard").orderBy("_sk", key_col)
    return (
        df.withColumn("_sk", sk)
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_sk")
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: str = "",
) -> DataFrame:
    """Near-dup-leakage-safe train/val/test split: hash-split keyed
    on the NEAR-DUP CLUSTER, not the document — every member of a
    near-dup cluster lands in the same split, so a test document can
    never have a near-copy in train `[PK: the dedup-aware split
    hygiene of The Pile / RefinedWeb / Dolma dataset cards — test
    leakage through near-duplicates inflates eval scores exactly
    like benchmark contamination does]`. The complement of ds6's
    EXTERNAL-benchmark decontamination: this closes the INTERNAL
    train->test leak.

    ``clusters`` is any (key, cluster) assignment — dd7's
    neardup_doc_clusters output in production; records absent from
    it (singletons) key on themselves via coalesce, so the split
    remains total over ``df``.

    Scale shape: one left equi-join on the key (the cluster frame is
    corpus-sized but thin — two longs), then hash_split's pure
    projection; no shuffle beyond the join.

    Returns ``df``'s rows with ``split_key`` (the effective cluster
    key) and ``split`` added."""
    cl = clusters.select(
        F.col(key_col).alias(key_col),
        F.col(cluster_col).alias("_cl"),
    )
    base = df.join(cl, on=key_col, how="left").withColumn(
        "split_key", F.coalesce(F.col("_cl"), F.col(key_col))
    ).drop("_cl")
    return hash_split(base, "split_key", weights, seed=seed)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    boundary: str,
    embargo_days: int = 0,
) -> DataFrame:
    """Time-based train/test split with an optional EMBARGO gap — the
    leakage-prevention discipline for temporally-correlated corpora
    `[PK: standard temporal holdout in forecasting/recsys evaluation;
    purged/embargoed splits, Lopez de Prado, "Advances in Financial
    Machine Learning", 2018, ch.7]`: training on the future of the
    test set (or on rows whose near-in-time duplicates sit in test —
    news wires, mirrored crawls) inflates eval scores exactly like
    the near-dup leak ds8 closes, but along the TIME axis the hash
    family cannot see.

    ``split`` = 'train' for rows strictly before ``boundary``,
    'test' for rows at/after ``boundary`` + ``embargo_days`` days,
    'embargo' for the gap between (excluded from both sides — the
    purge zone absorbing near-boundary temporal correlation); NULL
    timestamps get split NULL (callers decide their fate explicitly,
    the null-block discipline). Growth-stable like hash_split: a
    record's split never changes as later data arrives.

    Pure whole-stage-codegen projection — no shuffle, no UDF; the
    boundary comparison and the embargo offset are timestamp
    arithmetic both engines evaluate identically (exact integer
    microseconds under the session's UTC discipline)."""
    if embargo_days < 0:
        raise ValueError(f"embargo_days must be >= 0, got {embargo_days}")
    ts = F.col(ts_col)
    b = F.to_timestamp(F.lit(boundary))
    test_start = (
        b if embargo_days == 0
        else b + F.expr(f"INTERVAL {int(embargo_days)} DAYS")
    )
    return df.withColumn(
        "split",
        F.when(ts.isNull(), F.lit(None).cast("string"))
        .when(ts < b, F.lit("train"))
        .when(ts >= test_start, F.lit("test"))
        .otherwise(F.lit("embargo")),
    )
