"""End-to-end entity-LINKING run (the el1 -> el3 -> el4 chain as a
production job, complementing el.pipeline's entity-RESOLUTION run):
anchor corpus -> alias evidence -> commonness prior -> NIL-aware
mention resolution -> TAC-KBP evaluation against the planted gold.

The corpus is synthesized deterministically from integer ids (no
randomness — the fixtures discipline): every alias has a DOMINANT
catalog entity receiving 80% of its anchor links, a long tail of
noise hosts takes the rest, and every 9th alias is a planted 50/50
coin-flip between two entities — the case the el3 ``ambiguous`` rule
exists for. Gold is known by construction, so ``linking_eval``'s
accuracy / in-KB / NIL numbers are exact, not sampled.

Scale shape: stage 1 is the only corpus-wide pass (anchor extraction
+ one (host, alias) hash aggregate); everything after runs on the
catalog-sized prior table (broadcast) and the mention table (one
window per mention over <= 2 candidate rows + one mention-keyed
join). At 10^12 mentions the mention side never shuffles more than
twice.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def anchor_corpus(
    spark: SparkSession,
    n_links: int,
    n_aliases: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """One HTML page per link event ``i``: alias ``i % n_aliases``
    rendered with case/whitespace noise the normalizer must absorb,
    pointing at its dominant entity ``canon<k>.example.org`` for 8 of
    every 10 events, else a noise host ``alt<(i*7+1)%31>.example.net``.
    Every 9th alias is instead a strict A/B alternation (50/50 two-
    entity coin flip). A relative decoy anchor exercises the
    NULL-host drop. Columns: (page_id, page_html)."""
    df = spark.range(0, n_links, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    k = i % n_aliases
    # j indexes link events WITHIN an alias (i div n_aliases), so the
    # dominance and coin-flip decisions below cycle independently of
    # the alias id — with i%10-style tests they would be CONSTANT per
    # alias whenever n_aliases shares a factor with the modulus
    j = (i / n_aliases).cast("long")

    def s(c):
        return c.cast("string")

    anchor_text = (
        F.when(i % 3 == 0, F.concat(F.lit("Site  "), s(k), F.lit("  STORE")))
        .when(i % 3 == 1, F.concat(F.lit("site "), s(k), F.lit(" Store")))
        .otherwise(F.concat(F.lit("SITE "), s(k), F.lit("  store")))
    )
    ambiguous = (k % 9) == 0
    host = (
        F.when(
            ambiguous,
            F.concat(
                F.when(j % 2 == 0, F.lit("canona")).otherwise(F.lit("canonb")),
                s(k),
                F.lit(".example.org"),
            ),
        )
        .when(
            j % 10 < 8,
            F.concat(F.lit("canon"), s(k), F.lit(".example.org")),
        )
        .otherwise(
            F.concat(F.lit("alt"), s((i * 7 + 1) % 31), F.lit(".example.net"))
        )
    )
    page_html = F.concat(
        F.lit('<html><body><a href="https://'),
        host,
        F.lit("/p/"),
        s(i),
        F.lit('">'),
        anchor_text,
        F.lit('</a><a href="/rel/'),
        s(i % 5),
        F.lit('">more</a></body></html>'),
    )
    return df.select(i.alias("page_id"), page_html.alias("page_html"))


def mention_corpus(
    spark: SparkSession,
    n_mentions: int,
    n_aliases: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mention table with PLANTED gold: ``(mention_id, surface,
    gold_entity)``. Every 13th mention has a surface with no alias
    evidence (gold NIL); the rest carry alias ``m % n_aliases`` with
    case/whitespace noise, gold = the alias's dominant entity
    (``canon<k>.example.org``). For the planted 50/50 aliases the
    gold is ``canona<k>...`` by convention — the model CANNOT reliably
    earn these (the evidence is a coin flip); they exist to measure
    that el3 answers NIL instead of guessing, so they depress in-KB
    recall, never precision."""
    df = spark.range(0, n_mentions, 1, num_partitions or spark.sparkContext.defaultParallelism)
    m = F.col("id")
    k = m % n_aliases

    def s(c):
        return c.cast("string")

    surface = (
        F.when(m % 13 == 0, F.concat(F.lit("zzz unknown "), s(m)))
        .when(m % 2 == 0, F.concat(F.lit("SITE  "), s(k), F.lit(" store")))
        .otherwise(F.concat(F.lit("site "), s(k), F.lit("  STORE")))
    )
    gold = F.when(m % 13 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.when((k % 9) == 0, F.lit("canona")).otherwise(F.lit("canon")),
            s(k),
            F.lit(".example.org"),
        )
    )
    return df.select(
        m.alias("mention_id"), surface.alias("surface"), gold.alias("gold_entity")
    )


def run_linking(
    spark: SparkSession,
    n_links: int = 20000,
    n_aliases: int = 40,
    n_mentions: int = 5000,
    tau_num: int = 1,
    tau_den: int = 50,
    min_links: int = 1,
) -> dict:
    """The full linking run; returns the one-JSON-line dict the CLI
    prints. Deterministic end to end (integer corpora, integer-exact
    NIL rules), so the eval numbers are reproducible bit-for-bit at
    any parallelism."""
    from el.evaluate import linking_eval
    from el.extract import anchor_alias_stats, extract_anchor_texts
    from el.linking import alias_prior, resolve_links

    out: dict = {
        "n_links": n_links,
        "n_aliases": n_aliases,
        "n_mentions": n_mentions,
        "stages": {},
    }
    t_all = time.monotonic()

    t = time.monotonic()
    pages = anchor_corpus(spark, n_links, n_aliases)
    stats = anchor_alias_stats(
        extract_anchor_texts(pages, html_col="page_html", id_col="page_id"),
        src_col="page_id",
    ).localCheckpoint()  # evidence table: catalog-sized from here on
    out["stages"]["alias_evidence"] = {
        "rows": stats.count(),
        "wall_ms": int((time.monotonic() - t) * 1000),
    }

    t = time.monotonic()
    prior = alias_prior(stats)
    mentions = mention_corpus(spark, n_mentions, n_aliases)
    resolved = resolve_links(
        mentions.select("mention_id", "surface"),
        prior,
        tau_num=tau_num,
        tau_den=tau_den,
        min_links=min_links,
    ).localCheckpoint()
    n_res = resolved.count()
    out["stages"]["resolve"] = {
        "rows": n_res,
        "wall_ms": int((time.monotonic() - t) * 1000),
    }
    nil_reasons = {
        r["nil_reason"]: r["n"]
        for r in resolved.where(F.col("is_nil"))
        .groupBy("nil_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out["nil_reasons"] = nil_reasons

    t = time.monotonic()
    gold = mentions.select(
        "mention_id", F.col("gold_entity").alias("entity")
    )
    ev = linking_eval(resolved, gold).collect()[0].asDict()
    out["stages"]["evaluate"] = {
        "rows": 1,
        "wall_ms": int((time.monotonic() - t) * 1000),
    }
    out["eval"] = {
        kk: (round(v, 6) if isinstance(v, float) else v)
        for kk, v in ev.items()
    }

    wall = time.monotonic() - t_all
    out["wall_sec"] = round(wall, 2)
    out["mentions_per_sec"] = round(n_mentions / wall, 1)
    return out
