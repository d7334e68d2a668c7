"""Mention -> catalog entity linking (el.linking): alias-commonness
prior + context re-rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from el.linking import (
    alias_prior,
    entity_profiles,
    link_by_prior,
    rerank_by_context,
    resolve_links,
)


def _stats(spark):
    # alias evidence: 'paris' is ambiguous (city 6 links, person 2),
    # 'acme' unambiguous, 'one off' a single-link typo
    return spark.createDataFrame(
        [
            ("paris", "city:paris", 6, 3),
            ("paris", "person:paris", 2, 2),
            ("acme", "org:acme", 5, 4),
            ("one off", "org:typo", 1, 1),
        ],
        "alias string, dst_host string, n_links long, n_src_pages long",
    )


def test_alias_prior_totals_and_values(spark):
    p = {
        (r.alias, r.entity): r
        for r in alias_prior(_stats(spark)).collect()
    }
    assert p[("paris", "city:paris")].alias_total == 8
    assert p[("paris", "city:paris")].prior == 6 / 8
    assert p[("paris", "person:paris")].prior == 2 / 8
    assert p[("acme", "org:acme")].prior == 1.0
    # priors sum to exactly 1 per alias (n/total with a shared
    # denominator -> the float sum over one alias is exact here)
    by_alias = {}
    for (a, _), r in p.items():
        by_alias[a] = by_alias.get(a, 0.0) + r.prior
    assert all(v == pytest.approx(1.0, abs=1e-12) for v in by_alias.values())


def test_link_by_prior_ranking_normalization_and_drop(spark):
    mentions = spark.createDataFrame(
        [
            (1, "  PARIS "),        # case+trim noise -> ambiguous alias
            (2, "Acme"),            # unambiguous
            (3, "unknown thing"),   # no alias evidence -> dropped
            (4, "one   off"),       # whitespace collapse -> typo alias
            (5, None),              # NULL surface -> dropped
        ],
        "mention_id long, surface string",
    )
    prior = alias_prior(_stats(spark))
    out = link_by_prior(mentions, prior, k=2)
    rows = {(r.mention_id, r.rank): r for r in out.collect()}
    # mention 1: city first (6 links), person second
    assert rows[(1, 1)].entity == "city:paris"
    assert rows[(1, 2)].entity == "person:paris"
    assert rows[(1, 1)].prior == 0.75
    # mention 2: single candidate
    assert rows[(2, 1)].entity == "org:acme"
    assert (2, 2) not in rows
    # mention 3 and 5 dropped entirely
    assert not any(m in (3, 5) for m, _ in rows)
    # mention 4 links after whitespace collapse
    assert rows[(4, 1)].entity == "org:typo"
    # min_links drops the typo alias from the candidate set
    kept = link_by_prior(mentions, prior, k=2, min_links=2)
    assert not any(
        r.mention_id == 4 for r in kept.collect()
    )
    with pytest.raises(ValueError):
        link_by_prior(mentions, prior, k=0)


def test_link_by_prior_tie_breaks_by_entity(spark):
    stats = spark.createDataFrame(
        [("x", "b:ent", 3, 1), ("x", "a:ent", 3, 1)],
        "alias string, dst_host string, n_links long, n_src_pages long",
    )
    mentions = spark.createDataFrame(
        [(1, "x")], "mention_id long, surface string"
    )
    out = link_by_prior(mentions, alias_prior(stats), k=2).collect()
    got = {r.rank: r.entity for r in out}
    assert got == {1: "a:ent", 2: "b:ent"}


def test_link_by_prior_broadcasts_the_catalog_side(spark):
    mentions = spark.createDataFrame(
        [(1, "acme")], "mention_id long, surface string"
    )
    plan = (
        link_by_prior(mentions, alias_prior(_stats(spark)), k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def _vecs(spark):
    # two entities with clearly separated directions; vec_id order
    # makes label 0's exemplar (1,0,0,0) and label 1's (0,1,0,0)
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.0, 1.0, 0.0, 0.0], 1),
            (2, [0.9, 0.1, 0.0, 0.0], 0),
            (3, [0.1, 0.9, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )


def test_entity_profiles_exemplar_and_centroid(spark):
    vecs = _vecs(spark)
    ex = {r.entity: list(r.profile) for r in
          entity_profiles(vecs, method="exemplar", dim=4).collect()}
    assert ex[0] == pytest.approx([1.0, 0.0, 0.0, 0.0])
    assert ex[1] == pytest.approx([0.0, 1.0, 0.0, 0.0])
    cent = {r.entity: list(r.profile) for r in
            entity_profiles(vecs, method="centroid", dim=4).collect()}
    assert cent[0] == pytest.approx([0.95, 0.05, 0.0, 0.0])
    assert cent[1] == pytest.approx([0.05, 0.95, 0.0, 0.0])
    with pytest.raises(ValueError):
        entity_profiles(vecs, method="nope")


def test_rerank_by_context_overrides_prior_order(spark):
    vecs = _vecs(spark)
    # mention 2's context points at entity 0; the prior preferred
    # entity 1 (rank 1) — the context re-rank must flip it
    candidates = spark.createDataFrame(
        [(2, 1, 9), (2, 0, 1)],
        "mention_id long, entity int, n_links long",
    )
    contexts = vecs.select(
        F.col("vec_id").alias("mention_id"),
        F.col("embedding").alias("ctx_vec"),
    )
    profiles = entity_profiles(vecs, method="exemplar", dim=4)
    out = rerank_by_context(candidates, contexts, profiles, k=2)
    got = {r.ctx_rank: r.entity for r in out.collect()}
    assert got == {1: 0, 2: 1}
    # candidate columns survive the re-rank
    assert {r.entity: r.n_links for r in out.collect()} == {0: 1, 1: 9}
    with pytest.raises(ValueError):
        rerank_by_context(candidates, contexts, profiles, k=0)


def test_rerank_by_context_inner_join_semantics_and_determinism(spark):
    vecs = _vecs(spark)
    candidates = spark.createDataFrame(
        # mention 99 has no context vector; entity 7 has no profile
        [(2, 0, 1), (99, 0, 1), (2, 7, 1)],
        "mention_id long, entity int, n_links long",
    )
    contexts = vecs.select(
        F.col("vec_id").alias("mention_id"),
        F.col("embedding").alias("ctx_vec"),
    )
    profiles = entity_profiles(vecs, method="exemplar", dim=4)
    out = rerank_by_context(candidates, contexts, profiles, k=3)
    assert {(r.mention_id, r.entity) for r in out.collect()} == {(2, 0)}
    # bit-determinism across input partitionings
    out7 = rerank_by_context(
        candidates.repartition(7), contexts, profiles, k=3
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out7.collect())
    )


def test_linking_end_to_end_prior_then_context(spark):
    """The full two-signal linker: alias evidence -> prior candidates
    -> context re-rank, on a corpus where the prior alone picks the
    wrong entity for a context-specific mention."""
    stats = spark.createDataFrame(
        # 'jaguar' links mostly to the carmaker across the crawl
        [("jaguar", "org:cars", 9, 5), ("jaguar", "animal:cat", 3, 3)],
        "alias string, dst_host string, n_links long, n_src_pages long",
    )
    mentions = spark.createDataFrame(
        [(10, "Jaguar"), (11, "JAGUAR")],
        "mention_id long, surface string",
    )
    cand = link_by_prior(mentions, alias_prior(stats), k=2)
    # prior rank 1 is the carmaker for BOTH mentions
    assert all(
        r.entity == "org:cars"
        for r in cand.where(F.col("rank") == 1).collect()
    )
    profiles = spark.createDataFrame(
        [("org:cars", [1.0, 0.0]), ("animal:cat", [0.0, 1.0])],
        "entity string, profile array<float>",
    )
    contexts = spark.createDataFrame(
        # mention 10 appears in an automotive context, 11 in wildlife
        [(10, [0.9, 0.1]), (11, [0.2, 0.8])],
        "mention_id long, ctx_vec array<float>",
    )
    final = rerank_by_context(cand, contexts, profiles, k=1)
    got = {r.mention_id: r.entity for r in final.collect()}
    assert got == {10: "org:cars", 11: "animal:cat"}


def _nil_stats(spark):
    # evidence engineered so every NIL rule fires at tau = 1/2:
    # 'paris'  -> confident (best 6/8, top-2 counts differ)
    # 'acme'   -> confident (singleton, prior 1.0)
    # 'spread' -> low_prior (best 2/5 < 1/2, no tie)
    # 'tie'    -> ambiguous (3 vs 3)
    # 'both'   -> low_prior wins over ambiguous (1/3 tie; rule order)
    return spark.createDataFrame(
        [
            ("paris", "city:paris", 6, 3),
            ("paris", "person:paris", 2, 2),
            ("acme", "org:acme", 5, 4),
            ("spread", "e1", 2, 2),
            ("spread", "e2", 1, 1),
            ("spread", "e3", 1, 1),
            ("spread", "e4", 1, 1),
            ("tie", "t1", 3, 2),
            ("tie", "t2", 3, 2),
            ("both", "b1", 1, 1),
            ("both", "b2", 1, 1),
            ("both", "b3", 1, 1),
        ],
        "alias string, dst_host string, n_links long, n_src_pages long",
    )


def test_resolve_links_all_nil_rules_and_confident_links(spark):
    mentions = spark.createDataFrame(
        [
            (1, "  PARIS "),
            (2, "Acme"),
            (3, "unknown thing"),
            (4, "spread"),
            (5, "tie"),
            (6, "both"),
            (7, None),
        ],
        "mention_id long, surface string",
    )
    prior = alias_prior(_nil_stats(spark))
    out = resolve_links(mentions, prior, tau_num=1, tau_den=2)
    rows = {r.mention_id: r for r in out.collect()}
    # left-total: one row per INPUT mention, including the NULL surface
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    # confident links carry the full candidate payload
    assert not rows[1].is_nil and rows[1].entity == "city:paris"
    assert rows[1].n_links == 6 and rows[1].alias_total == 8
    assert rows[1].prior == 6 / 8 and rows[1].nil_reason is None
    assert not rows[2].is_nil and rows[2].entity == "org:acme"
    # each NIL rule, with payload columns all NULLed
    assert rows[3].is_nil and rows[3].nil_reason == "no_evidence"
    assert rows[4].is_nil and rows[4].nil_reason == "low_prior"
    assert rows[5].is_nil and rows[5].nil_reason == "ambiguous"
    assert rows[6].is_nil and rows[6].nil_reason == "low_prior"
    assert rows[7].is_nil and rows[7].nil_reason == "no_evidence"
    for mid in (3, 4, 5, 6, 7):
        r = rows[mid]
        assert r.entity is None and r.n_links is None
        assert r.alias_total is None and r.prior is None
    # raw (un-normalized) surface is preserved on every row
    assert rows[1].surface == "  PARIS "


def test_resolve_links_tau_gates_the_prior_threshold(spark):
    mentions = spark.createDataFrame(
        [(1, "spread")], "mention_id long, surface string"
    )
    prior = alias_prior(_nil_stats(spark))
    # best prior for 'spread' is exactly 2/5; tau 2/5 is NOT below
    # the bar (strict <), tau just above it is
    ok = resolve_links(mentions, prior, tau_num=2, tau_den=5).collect()[0]
    assert not ok.is_nil and ok.entity == "e1"
    nil = resolve_links(mentions, prior, tau_num=41, tau_den=100).collect()[0]
    assert nil.is_nil and nil.nil_reason == "low_prior"


def test_linking_eval_contingency_and_silence_is_nil(spark):
    from el.evaluate import linking_eval

    gold = spark.createDataFrame(
        [
            (1, "e1"),   # correct KB link
            (2, "e2"),   # wrong KB link (pred e9)
            (3, None),   # correct NIL
            (4, "e4"),   # pred NIL on a KB mention (missed link)
            (5, None),   # pred KB on a NIL mention (false link)
            (6, "e6"),   # MISSING from pred -> counts as NIL pred
        ],
        "mention_id long, entity string",
    )
    pred = spark.createDataFrame(
        [(1, "e1"), (2, "e9"), (3, None), (4, None), (5, "e5")],
        "mention_id long, entity string",
    )
    r = linking_eval(pred, gold).collect()[0]
    assert r.n_mentions == 6
    assert r.n_gold_kb == 4
    # mention 6 is absent from pred -> NIL prediction, so 3 KB preds
    assert r.n_pred_kb == 3
    assert r.n_correct_kb == 1 and r.n_correct_nil == 1
    assert r.accuracy == 2 / 6
    assert r.kb_p == 1 / 3 and r.kb_r == 1 / 4
    assert r.kb_f1 == pytest.approx(2 * (1 / 3) * (1 / 4) / (1 / 3 + 1 / 4))
    assert r.nil_p == 1 / 3 and r.nil_r == 1 / 2


def test_linking_eval_on_resolve_links_output(spark):
    """The el3 -> el4 composition: resolve_links' NIL column feeds
    linking_eval directly (entity NULL iff is_nil)."""
    from el.evaluate import linking_eval

    mentions = spark.createDataFrame(
        [(1, "PARIS"), (2, "acme"), (3, "unknown"), (4, "tie")],
        "mention_id long, surface string",
    )
    prior = alias_prior(_nil_stats(spark))
    pred = resolve_links(mentions, prior, tau_num=1, tau_den=2)
    gold = spark.createDataFrame(
        [(1, "city:paris"), (2, "org:acme"), (3, None), (4, "t1")],
        "mention_id long, entity string",
    )
    r = linking_eval(pred, gold).collect()[0]
    # 1 and 2 linked correctly; 3 NIL-correct; 4 gold-KB but the tie
    # forces a NIL prediction (the conservative miss, not a wrong link)
    assert r.n_correct_kb == 2 and r.n_correct_nil == 1
    assert r.accuracy == 3 / 4
    assert r.kb_p == 1.0 and r.kb_r == 2 / 3


# ---------------------------------------------------------------------------
# el5: collective TAGME voting re-rank
# ---------------------------------------------------------------------------


def _vote_ref(cands, rel, scale=10**9):
    """Pure-python fixed-point TAGME voting: cands = [(doc, m, e, nl,
    at)], rel = {(a, b): (nc, nu)} with a < b. Returns {(m, e): vote}."""
    from collections import defaultdict

    ncand = defaultdict(int)
    for _, m, *_ in cands:
        ncand[m] += 1
    votes = defaultdict(int)
    for doc_t, m_t, e_t, _, _ in cands:
        for doc_v, m_v, e_v, nl, at in cands:
            if doc_v != doc_t or m_v == m_t:
                continue
            if e_t == e_v:
                votes[(m_t, e_t)] += (nl * scale) // (at * ncand[m_v])
            else:
                key = (min(e_t, e_v), max(e_t, e_v))
                if key in rel:
                    nc, nu = rel[key]
                    votes[(m_t, e_t)] += (nc * nl * scale) // (
                        nu * at * ncand[m_v]
                    )
                else:
                    votes[(m_t, e_t)] += 0
    return dict(votes)


def test_entity_relatedness_components(spark):
    from el.linking import entity_relatedness

    edges = spark.createDataFrame(
        [
            ("h1", "A"), ("h1", "B"), ("h2", "A"), ("h2", "B"),
            ("h3", "A"), ("h3", "C"), ("h4", "D"),
            ("h1", "A"),  # duplicate edge: postings are distinct
        ],
        "src string, dst string",
    )
    got = {
        (r["entity_a"], r["entity_b"]): (r["n_common"], r["n_union"])
        for r in entity_relatedness(edges).collect()
    }
    # in(A)={h1,h2,h3}, in(B)={h1,h2}, in(C)={h3}, in(D)={h4}
    assert got == {
        ("A", "B"): (2, 3),   # common {h1,h2}, union {h1,h2,h3}
        ("A", "C"): (1, 3),
    }  # (B,C) share nothing; D is isolated -> no rows


def test_vote_rerank_matches_python_reference(spark):
    from el.linking import entity_relatedness, vote_rerank

    rng = __import__("random").Random(5)
    hosts = [f"h{i}" for i in range(12)]
    ents = [f"E{i}" for i in range(8)]
    edges = [
        (rng.choice(hosts), rng.choice(ents)) for _ in range(60)
    ]
    cands = []
    mid = 0
    for d in range(6):
        for _ in range(rng.randrange(2, 5)):  # mentions per doc
            mid += 1
            for e in rng.sample(ents, rng.randrange(1, 4)):
                cands.append(
                    (f"d{d}", mid, e, rng.randrange(1, 9),
                     rng.randrange(9, 20))
                )
    edf = spark.createDataFrame(edges, "src string, dst string")
    cdf = spark.createDataFrame(
        cands,
        "doc string, mention_id long, entity string, "
        "n_links long, alias_total long",
    )
    rel_df = entity_relatedness(edf)
    rel = {
        (r["entity_a"], r["entity_b"]): (r["n_common"], r["n_union"])
        for r in rel_df.collect()
    }
    want = _vote_ref(cands, rel)
    got = {
        (r["mention_id"], r["entity"]): r["vote_score"]
        for r in vote_rerank(cdf, rel_df, k=10).collect()
    }
    assert got == want


def test_vote_rerank_coherence_beats_prior(spark):
    """The voting signal's purpose: in a document about programming,
    'python' the LANGUAGE must outrank 'python' the SNAKE even when
    the snake has the higher global prior — because the language is
    related (shared in-links) to the document's other mention."""
    from el.linking import entity_relatedness, vote_rerank

    edges = spark.createDataFrame(
        [
            ("dev1", "lang:python"), ("dev1", "sw:django"),
            ("dev2", "lang:python"), ("dev2", "sw:django"),
            ("zoo1", "animal:python"),
        ],
        "src string, dst string",
    )
    cands = spark.createDataFrame(
        [
            # mention 1 'python': snake has the bigger prior
            ("doc", 1, "animal:python", 9, 10),
            ("doc", 1, "lang:python", 1, 10),
            # mention 2 'django': unambiguous
            ("doc", 2, "sw:django", 5, 5),
        ],
        "doc string, mention_id long, entity string, "
        "n_links long, alias_total long",
    )
    rel = entity_relatedness(edges)
    top = {
        r["mention_id"]: r["entity"]
        for r in vote_rerank(cands, rel, k=1).collect()
    }
    assert top[1] == "lang:python"  # coherence overrides the prior


def test_vote_rerank_same_entity_reinforcement_and_ties(spark):
    """rel(e, e) = 1: two mentions sharing a candidate entity
    reinforce it even with NO relatedness rows at all; vote ties
    break deterministically by entity."""
    from el.linking import vote_rerank

    cands = spark.createDataFrame(
        [
            ("d", 1, "X", 1, 2), ("d", 1, "Z", 1, 2),
            ("d", 2, "X", 1, 2), ("d", 2, "Y", 1, 2),
        ],
        "doc string, mention_id long, entity string, "
        "n_links long, alias_total long",
    )
    empty_rel = spark.createDataFrame(
        [], "entity_a string, entity_b string, n_common long, n_union long"
    )
    rows = vote_rerank(cands, empty_rel, k=2).collect()
    votes = {(r["mention_id"], r["entity"]): r["vote_score"] for r in rows}
    s = 10**9
    # X gets the cross-mention self vote: (1 * s) // (2 * 2)
    assert votes[(1, "X")] == s // 4 and votes[(2, "X")] == s // 4
    assert votes[(1, "Z")] == 0 and votes[(2, "Y")] == 0
    ranks = {
        (r["mention_id"], r["entity"]): r["vote_rank"] for r in rows
    }
    assert ranks[(1, "X")] == 1 and ranks[(1, "Z")] == 2


def test_vote_rerank_partition_invariant(spark):
    from el.linking import entity_relatedness, vote_rerank
    from el.queries import REGISTRY

    out = REGISTRY["el5_vote_rerank"].fn(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.repartition(17).collect()))
    assert a == b
