"""Two-table record linkage (el.linkage.link_tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from el.linkage import link_tables


def _tables(spark):
    left = spark.createDataFrame(
        [
            (1, "ACME Corp", "US", 10),
            (2, "Globex Inc", "US", 10),
            (3, "Initech LLC", "DE", 20),
            (4, "Umbrella Co", "FR", 30),
        ],
        "lid long, name string, country string, grp int",
    )
    right = spark.createDataFrame(
        [
            (101, "acme corpo", "US", 10),    # fuzzy match of 1
            (102, "globex incx", "US", 10),   # fuzzy match of 2
            (103, "initech ltd", "DE", 20),   # weaker match of 3
            (104, "wayne ent", "US", 10),     # no match
            (105, "acme corpo", "GB", 10),    # name matches 1, attr doesn't
        ],
        "rid long, name string, country string, grp int",
    )
    return left, right


def test_link_tables_block_on_and_threshold(spark):
    left, right = _tables(spark)

    def run(threshold):
        return {
            (r.l_id, r.r_id): r.jw
            for r in link_tables(
                left, right, "lid", "rid", "name", "name",
                threshold=threshold, block_tokens=1, prefix_len=4,
                block_on=(["country", "grp"], ["country", "grp"]),
            ).collect()
        }

    out = run(0.9)
    assert (1, 101) in out and out[(1, 101)] >= 0.9
    assert (2, 102) in out
    # attr mismatch blocks the GB acme even though the name is identical
    assert (1, 105) not in out
    # the weak pair sits at jw=0.9273 (DuckDB jaro_winkler_similarity
    # agrees): present at 0.9, cut by 0.95 — the threshold is load-bearing
    assert out[(3, 103)] == pytest.approx(0.9273, abs=1e-4)
    assert (3, 103) not in run(0.95)


def test_link_tables_single_token_names_link(spark):
    # a single-token name must still get a block key at block_tokens=2
    # (key from min(available, block_tokens) tokens; only empty drops)
    left = spark.createDataFrame([(1, "ibm")], "lid long, name string")
    right = spark.createDataFrame(
        [(9, "ibm"), (10, "")], "rid long, name string"
    )
    out = link_tables(
        left, right, "lid", "rid", "name", "name",
        threshold=0.9, block_tokens=2, prefix_len=4,
    ).collect()
    assert [(r.l_id, r.r_id, r.jw) for r in out] == [(1, 9, 1.0)]


def test_link_tables_null_block_attr_matches_nothing(spark):
    left, right = _tables(spark)
    left_null = left.withColumn(
        "country", F.when(F.col("lid") == 1, None).otherwise(F.col("country"))
    )
    out = link_tables(
        left_null, right, "lid", "rid", "name", "name",
        threshold=0.5, block_tokens=1, prefix_len=4,
        block_on=(["country"], ["country"]),
    ).where(F.col("l_id") == 1)
    assert out.count() == 0


def test_link_tables_explode_all_improves_recall(spark):
    left = spark.createDataFrame(
        [(1, "johann sebastian bach")], "lid long, name string"
    )
    right = spark.createDataFrame(
        # first token differs entirely -> single leading-token key misses,
        # but the 'sebastian'/'bach' token keys hit
        [(9, "joh sebastian bach")], "rid long, name string"
    )
    single = link_tables(
        left, right, "lid", "rid", "name", "name",
        threshold=0.8, block_tokens=1, prefix_len=4,
    )
    multi = link_tables(
        left, right, "lid", "rid", "name", "name",
        threshold=0.8, block_tokens=1, prefix_len=4, explode_all=True,
    )
    assert single.count() == 0
    assert multi.count() == 1


def test_link_tables_cap_bounds_block_membership(spark):
    # 30 identical-key rows per side; cap_k=5 bounds candidates at 25
    rows = [(i, "dup name") for i in range(30)]
    left = spark.createDataFrame(rows, "lid long, name string")
    right = spark.createDataFrame(rows, "rid long, name string")
    capped = link_tables(
        left, right, "lid", "rid", "name", "name",
        threshold=0.0, block_tokens=1, prefix_len=4, cap_k=5,
    )
    assert capped.count() == 25


def test_link_tables_hostile_long_name_is_bounded(spark):
    # r3 verdict "What's wrong #1": a 4 KB name must not blow up the
    # Jaro-Winkler kernel (el/simfn.py JW_MAX_LEN + banding).  The pair
    # still links: the first 128 bytes of both sides agree.
    long_a = "HOME ABOUT PRODUCTS CONTACT " * 150
    long_b = long_a[:2000] + " TRAILING DIFFERENCE"
    left = spark.createDataFrame(
        [(1, long_a), (2, "acme corp")], "lid long, name string"
    )
    right = spark.createDataFrame(
        [(11, long_b), (12, "acme corpo")], "rid long, name string"
    )
    out = {
        (r.l_id, r.r_id): r.jw
        for r in link_tables(
            left, right, "lid", "rid", "name", "name",
            threshold=0.9, block_tokens=1, prefix_len=4,
        ).collect()
    }
    assert out[(1, 11)] == pytest.approx(1.0)
    assert (2, 12) in out


# -- Fellegi-Sunter (lk2) -------------------------------------------------


def _fs_tables(spark):
    left = spark.createDataFrame(
        [(1, "nyc", 10), (2, "nyc", 20), (3, "sf", 10), (4, None, 30)],
        "id long, city string, zip long",
    )
    right = spark.createDataFrame(
        [(1, "nyc", 10), (2, "la", 20), (3, "sf", 99), (4, "sf", 30)],
        "id long, city string, zip long",
    )
    return left, right


def test_estimate_u_exact_value_frequency_products(spark):
    from el.linkage import estimate_u

    left, right = _fs_tables(spark)
    u = {r["field"]: r for r in estimate_u(left, right, ["city", "zip"]).collect()}
    # city: l has nyc x2, sf x1 (NULL excluded); r has nyc x1, sf x2, la x1
    # agree pairs = 2*1 + 1*2 = 4; denominator 4*4 = 16
    assert u["city"].n_agree_pairs == 4 and u["city"].n_pairs == 16
    assert u["city"].u == 4 / 16
    # zip: l {10:2, 20:1, 30:1}; r {10:1, 20:1, 99:1, 30:1}
    # agree = 2*1 + 1*1 + 1*1 = 4
    assert u["zip"].n_agree_pairs == 4 and u["zip"].u == 4 / 16


def test_field_agreements_null_never_agrees(spark):
    from el.linkage import field_agreements

    cands = spark.createDataFrame(
        [(1, "a", "a", 5, 5), (2, None, None, 5, 6), (3, "a", None, None, 7)],
        "pid long, l_city string, r_city string, l_zip long, r_zip long",
    )
    g = {r.pid: r for r in field_agreements(cands, ["city", "zip"]).collect()}
    assert g[1].g_city == 1 and g[1].g_zip == 1
    # NULL == NULL is NOT agreement (both-null pair disagrees)
    assert g[2].g_city == 0 and g[2].g_zip == 0
    assert g[3].g_city == 0 and g[3].g_zip == 0


def test_estimate_m_and_fs_score_separation(spark):
    from el.linkage import estimate_m, field_agreements, fs_score

    # labeled matches: city agrees 3/4, zip agrees 4/4
    labeled = spark.createDataFrame(
        [
            ("a", "a", 1, 1), ("b", "b", 2, 2),
            ("c", "x", 3, 3), ("d", "d", 4, 4),
        ],
        "l_city string, r_city string, l_zip long, r_zip long",
    )
    gl = field_agreements(labeled, ["city", "zip"])
    m = {r["field"]: r for r in estimate_m(gl, ["city", "zip"]).collect()}
    assert m["city"].m == 3 / 4 and m["city"].n_matches == 4
    assert m["zip"].m == 1.0

    params = {"city": (0.75, 0.25), "zip": (0.95, 0.05)}
    cands = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 0), (3, 0, 0)],
        "pid long, g_city int, g_zip int",
    )
    out = {r.pid: r for r in fs_score(cands, params, prior=0.5).collect()}
    # full agreement: (0.75/0.25) * (0.95/0.05) = 3 * 19 = 57
    assert out[1].bayes_factor == pytest.approx(57.0)
    assert out[1].match_prob == pytest.approx(57 / 58)
    # monotone: more agreement -> strictly higher factor
    assert out[1].bayes_factor > out[2].bayes_factor > out[3].bayes_factor
    # full disagreement is evidence AGAINST (factor < 1)
    assert out[3].bayes_factor < 1.0
    assert 0.0 < out[3].match_prob < 0.5


def test_fs_score_rejects_degenerate_params(spark):
    from el.linkage import fs_score

    cands = spark.createDataFrame([(1, 1)], "pid long, g_city int")
    with pytest.raises(ValueError, match="m=0.2 <= u=0.5"):
        fs_score(cands, {"city": (0.2, 0.5)})
    with pytest.raises(ValueError, match="need 0 < u < 1"):
        fs_score(cands, {"city": (0.9, 0.0)})
    with pytest.raises(ValueError, match="prior"):
        fs_score(cands, {"city": (0.9, 0.1)}, prior=1.0)


def test_fs_end_to_end_true_pairs_outscore_decoys(spark):
    from el.linkage import estimate_u, field_agreements, fs_score

    left, right = _fs_tables(spark)
    u = {r["field"]: r["u"] for r in estimate_u(left, right, ["city", "zip"]).collect()}
    params = {f: (0.95, u[f]) for f in ["city", "zip"]}
    true_p = left.selectExpr("id l_id", "city l_city", "zip l_zip").join(
        right.selectExpr("id r_id", "city r_city", "zip r_zip"),
        F.col("l_id") == F.col("r_id"),
    )
    decoys = left.selectExpr("id l_id", "city l_city", "zip l_zip").join(
        right.selectExpr("id r_id", "city r_city", "zip r_zip"),
        F.col("l_id") == F.col("r_id") - 2,
    )
    st = fs_score(field_agreements(true_p, ["city", "zip"]), params, prior=0.5)
    sd = fs_score(field_agreements(decoys, ["city", "zip"]), params, prior=0.5)
    # the fully-agreeing true pair beats every decoy pair
    best_true = max(r.match_prob for r in st.collect())
    assert best_true > max(r.match_prob for r in sd.collect())
    assert best_true > 0.9


def test_fuse_records_majority_vote_and_tiebreak(spark):
    from el.linkage import fuse_records

    df = spark.createDataFrame(
        [
            # cluster 1: 'acme' wins city 2-1; zip tie 10/20 -> min
            (1, "acme", 10),
            (1, "acme", 20),
            (1, "acmee", None),
            # cluster 2: only NULL city -> fused NULL; zip 7
            (2, None, 7),
        ],
        "cluster long, name string, zip int",
    )
    got = {r["cluster"]: r for r in
           fuse_records(df, "cluster", ["name", "zip"]).collect()}
    assert got[1]["n_records"] == 3
    assert got[1]["name"] == "acme"
    assert got[1]["zip"] == 10          # count tie, smaller value wins
    assert got[2]["name"] is None       # every record abstained
    assert got[2]["zip"] == 7
    with pytest.raises(ValueError):
        fuse_records(df, "cluster", [])


def _em_gammas(spark, n=4000):
    # deterministic planted mixture: pairs i in [0, n); matches are
    # i % 4 == 0 (lambda = 0.25). Hash-style Bernoulli from modular
    # arithmetic (no rand()): field a agrees on matches unless i%10==1
    # (m_a = 0.9), on non-matches iff i%5==0 (u_a = 0.2); field b
    # m_b = 0.8 (i%5 in {1..4}... via i%5!=1), u_b = 0.1 (i%10==3).
    # three fields: two-class EM over binary indicators needs >= 3
    # conditionally independent fields to be identifiable (the
    # classic Fellegi-Sunter 3-field condition). Draws are md5-hash
    # Bernoullis — deterministic AND (unlike modular-arithmetic
    # patterns) independent across fields, matching the model EM fits.
    import hashlib

    def u01(i, tag):
        h = hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
        return int(h[:8], 16) / 2**32

    m_p = {"a": 0.9, "b": 0.8, "c": 0.75}
    u_p = {"a": 0.2, "b": 0.13, "c": 0.14}
    rows = []
    for i in range(n):
        match = u01(i, "lam") < 0.25
        p = m_p if match else u_p
        rows.append(
            (i, int(match))
            + tuple(int(u01(i, f) < p[f]) for f in ("a", "b", "c"))
        )
    return spark.createDataFrame(
        rows, "pair long, is_match int, g_a int, g_b int, g_c int"
    )


def test_gamma_pattern_counts_bounded_and_exact(spark):
    from el.linkage import gamma_pattern_counts

    g = _em_gammas(spark, 400)
    pats = gamma_pattern_counts(g, ["a", "b"]).collect()
    assert len(pats) <= 4
    assert sum(r["n_pairs"] for r in pats) == 400


def test_estimate_em_matches_pure_python_reference(spark):
    from el.linkage import estimate_em, gamma_pattern_counts

    g = _em_gammas(spark)
    params, lam = estimate_em(g, ["a", "b"], iters=25)

    # independent pure-python EM over the same pattern counts
    pats = {
        (r["g_a"], r["g_b"]): r["n_pairs"]
        for r in gamma_pattern_counts(g, ["a", "b"]).collect()
    }
    m, u, l2 = [0.9, 0.9], [0.1, 0.1], 0.1
    eps = 1e-6
    for _ in range(25):
        wm_tot = wu_tot = 0.0
        wm_f, wu_f = [0.0, 0.0], [0.0, 0.0]
        for (ga, gb), c in pats.items():
            gs = (ga, gb)
            pm, pu = l2, 1.0 - l2
            for j in range(2):
                pm *= m[j] if gs[j] == 1 else 1.0 - m[j]
                pu *= u[j] if gs[j] == 1 else 1.0 - u[j]
            r = pm / (pm + pu)
            wm_tot += c * r
            wu_tot += c * (1.0 - r)
            for j in range(2):
                if gs[j] == 1:
                    wm_f[j] += c * r
                    wu_f[j] += c * (1.0 - r)
        total = wm_tot + wu_tot
        l2 = min(max(wm_tot / total, eps), 1.0 - eps)
        m = [min(max(wm_f[j] / wm_tot, eps), 1.0 - eps) for j in range(2)]
        u = [min(max(wu_f[j] / wu_tot, eps), 1.0 - eps) for j in range(2)]
    assert lam == pytest.approx(l2, abs=1e-12)
    for j, f in enumerate(["a", "b"]):
        assert params[f][0] == pytest.approx(m[j], abs=1e-12)
        assert params[f][1] == pytest.approx(u[j], abs=1e-12)


def test_estimate_em_recovers_planted_parameters(spark):
    from el.linkage import estimate_em, fs_score

    fields = ["a", "b", "c"]
    g = _em_gammas(spark)
    params, lam = estimate_em(g, fields, iters=60)
    # ground truth known per row: EM (no labels) must land near the
    # EMPIRICAL conditional agreement rates of the planted mixture
    rows = g.collect()
    hit = [r for r in rows if r["is_match"] == 1]
    miss = [r for r in rows if r["is_match"] == 0]
    assert lam == pytest.approx(len(hit) / len(rows), abs=0.1)
    for f in fields:
        m_emp = sum(r["g_" + f] for r in hit) / len(hit)
        u_emp = sum(r["g_" + f] for r in miss) / len(miss)
        assert params[f][0] == pytest.approx(m_emp, abs=0.1)
        assert params[f][1] == pytest.approx(u_emp, abs=0.1)
        assert params[f][0] > params[f][1]
    # the estimates compose with fs_score (m > u guard passes) and
    # true matches outscore non-matches on average
    scored = fs_score(g, params, prior=lam).collect()
    shit = [r for r in scored if r["is_match"] == 1]
    smiss = [r for r in scored if r["is_match"] == 0]
    avg = lambda xs: sum(x["match_prob"] for x in xs) / len(xs)  # noqa: E731
    assert avg(shit) > 2 * avg(smiss)
    assert avg(shit) > 0.6


def test_estimate_em_partition_invariant_and_guarded(spark):
    from el.linkage import estimate_em

    g = _em_gammas(spark, 800)
    p1, l1 = estimate_em(g.repartition(1), ["a", "b"], iters=10)
    p2, l2 = estimate_em(g.repartition(17), ["a", "b"], iters=10)
    assert p1 == p2 and l1 == l2    # exact counts -> identical doubles
    with pytest.raises(ValueError):
        estimate_em(g, [], iters=10)
    with pytest.raises(ValueError):
        estimate_em(g, ["a"], iters=0)
    with pytest.raises(ValueError):
        estimate_em(g.where("pair < 0"), ["a"], iters=5)


def test_mutual_best_match_python_reference_and_properties(spark):
    """Symmetric best match vs a pure-python reference on an
    md5-derived bipartite candidate graph, plus the matching
    invariants: each side id appears at most once, output is a
    subset of input, and every kept pair is max-score on BOTH
    sides."""
    import hashlib

    from el.linkage import mutual_best_match

    pairs = []
    for a in range(20):
        for b in range(15):
            h = int(hashlib.md5(f"{a}|{b}".encode()).hexdigest()[:8], 16)
            if h % 3 == 0:  # sparse graph
                pairs.append((a, b, h % 100))
    df = spark.createDataFrame(pairs, "a_id long, b_id long, score long")

    best_l, best_r = {}, {}
    for a, b, s in pairs:
        # order by (-score, other id): min tuple wins
        if a not in best_l or (-s, b) < best_l[a]:
            best_l[a] = (-s, b)
        if b not in best_r or (-s, a) < best_r[b]:
            best_r[b] = (-s, a)
    ref = sorted(
        (a, b, s)
        for a, b, s in pairs
        if best_l[a] == (-s, b) and best_r[b] == (-s, a)
    )
    got = sorted(
        (r.a_id, r.b_id, r.score) for r in mutual_best_match(df).collect()
    )
    assert got == ref and got
    assert len({a for a, _, _ in got}) == len(got)  # matching: left once
    assert len({b for _, b, _ in got}) == len(got)  # right once
    assert set(got) <= set(pairs)


def test_mutual_best_match_tie_break_and_plan(spark):
    """Equal scores break by the other side's id ascending (stable
    across engines/partitionings), and both rank-1 filters compile
    to WindowGroupLimit — never a full per-group sort."""
    from el.linkage import mutual_best_match

    rows = [(1, 10, 5), (1, 11, 5), (2, 10, 5), (2, 12, 5)]
    df = spark.createDataFrame(rows, "a_id long, b_id long, score long")
    out = mutual_best_match(df)
    got = sorted((r.a_id, r.b_id) for r in out.collect())
    # left 1 prefers b=10 (tie -> lower id); right 10 prefers a=1;
    # left 2 prefers 10 but loses it, and 12 prefers 2 while 2's
    # best is 10 -> (2,12) is not mutual
    assert got == [(1, 10)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2


def test_greedy_matching_equals_sequential_greedy(spark):
    """With enough rounds, iterated mutual best match reproduces the
    SEQUENTIAL greedy-by-weight matching exactly (locally-dominant
    edge matching; per-node tie-breaks consistent with the global
    (score desc, a_id, b_id) order), and the result is maximal: no
    remaining edge has both endpoints unmatched."""
    import hashlib

    import pytest as _pt

    from el.linkage import greedy_matching

    pairs = []
    for a in range(25):
        for b in range(20):
            h = int(hashlib.md5(f"g{a}|{b}".encode()).hexdigest()[:8], 16)
            if h % 4 == 0:
                pairs.append((a, b, h % 50))  # many score ties
    df = spark.createDataFrame(pairs, "a_id long, b_id long, score long")

    # sequential greedy in global (score desc, a, b) order
    ml, mr, ref = set(), set(), set()
    for a, b, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if a not in ml and b not in mr:
            ml.add(a)
            mr.add(b)
            ref.add((a, b, s))

    out = greedy_matching(df, rounds=25).collect()
    got = {(r.a_id, r.b_id, r.score) for r in out}
    assert got == ref
    # rounds partition the matching; round 1 == mutual best match
    assert len(out) == len({(r.a_id, r.b_id) for r in out})
    rounds = sorted({r.match_round for r in out})
    assert rounds[0] == 1 and rounds == list(range(1, len(rounds) + 1))
    # maximality: every input edge touches a matched node
    for a, b, _ in pairs:
        assert a in ml or b in mr
    with _pt.raises(ValueError):
        greedy_matching(df, rounds=0)


# ---------------------------------------------------------------------------
# fs_score_tf (lk6): term-frequency-adjusted Fellegi-Sunter
# ---------------------------------------------------------------------------


def test_value_pair_frequencies_sum_to_estimate_u(spark):
    """Per-value counts are estimate_u BEFORE the final sum: summing a
    field's n_value_pairs reproduces its n_agree_pairs exactly."""
    from el.linkage import estimate_u, value_pair_frequencies

    left, right = _fs_tables(spark)
    vf = value_pair_frequencies(left, right, ["city", "zip"])
    sums = {
        r["field"]: r["s"]
        for r in vf.groupBy("field")
        .agg(F.sum("n_value_pairs").alias("s"))
        .collect()
    }
    u = {
        r["field"]: r["n_agree_pairs"]
        for r in estimate_u(left, right, ["city", "zip"]).collect()
    }
    assert sums == u
    # and the individual products are right: city nyc = 2*1, sf = 1*2
    vals = {
        (r["field"], r["value"]): r["n_value_pairs"] for r in vf.collect()
    }
    assert vals[("city", "nyc")] == 2 and vals[("city", "sf")] == 2
    assert ("city", "la") not in vals  # absent on the left side


def test_fs_score_tf_rare_value_outweighs_common(spark):
    """Two pairs both agree on city; the pair agreeing on the RARE
    city must get the larger Bayes factor — the whole point of the
    adjustment — while plain fs_score scores them identically."""
    from el.linkage import (
        estimate_u,
        field_agreements,
        fs_score,
        fs_score_tf,
        value_pair_frequencies,
    )

    # 9 'smith' rows and 1 'zyl' row on each side
    rows = [(i, "smith" if i else "zyl") for i in range(10)]
    left = spark.createDataFrame(rows, "id long, city string")
    right = spark.createDataFrame(rows, "id long, city string")
    cands = spark.createDataFrame(
        [(0, 0, "zyl", "zyl"), (1, 1, "smith", "smith")],
        "l_id long, r_id long, l_city string, r_city string",
    )
    g = field_agreements(cands, ["city"])
    u = estimate_u(left, right, ["city"]).collect()[0]["u"]
    params = {"city": (0.95, u)}
    vf = value_pair_frequencies(left, right, ["city"])
    tf = {
        r["l_id"]: r["bayes_factor"]
        for r in fs_score_tf(g, params, vf, 100).collect()
    }
    plain = {
        r["l_id"]: r["bayes_factor"]
        for r in fs_score(g, params).collect()
    }
    assert plain[0] == plain[1]  # field-level u cannot tell them apart
    assert tf[0] > tf[1]  # rare agreement is stronger evidence
    # exact values: u_zyl = 1/100, u_smith = 81/100
    assert tf[0] == 0.95 / (1 / 100)
    assert tf[1] == 0.95 / (81 / 100)


def test_fs_score_tf_no_tf_fields_equals_fs_score(spark):
    from el.linkage import (
        estimate_u,
        field_agreements,
        fs_score,
        fs_score_tf,
        value_pair_frequencies,
    )

    left, right = _fs_tables(spark)
    cand = left.select(
        F.col("id").alias("l_id"),
        F.col("city").alias("l_city"),
        F.col("zip").alias("l_zip"),
    ).join(
        right.select(
            F.col("id").alias("r_id"),
            F.col("city").alias("r_city"),
            F.col("zip").alias("r_zip"),
        ),
        F.col("l_id") == F.col("r_id"),
    )
    g = field_agreements(cand, ["city", "zip"])
    u = {
        r["field"]: r["u"]
        for r in estimate_u(left, right, ["city", "zip"]).collect()
    }
    params = {"city": (0.95, u["city"]), "zip": (0.9, u["zip"])}
    vf = value_pair_frequencies(left, right, ["city", "zip"])
    a = {
        (r["l_id"], r["r_id"]): (r["bayes_factor"], r["match_prob"])
        for r in fs_score_tf(
            g, params, vf, 16, tf_fields=[], prior=0.4
        ).collect()
    }
    b = {
        (r["l_id"], r["r_id"]): (r["bayes_factor"], r["match_prob"])
        for r in fs_score(g, params, prior=0.4).collect()
    }
    assert a == b  # bit-identical when no field is tf-adjusted


def test_fs_score_tf_stale_artifact_falls_back_to_field_u(spark):
    """A value missing from the persisted vfreq artifact (scored
    corpus moved on) must fall back to the field-level u, never
    error or NULL out."""
    from el.linkage import field_agreements, fs_score_tf

    cands = spark.createDataFrame(
        [(1, 1, "newcity", "newcity")],
        "l_id long, r_id long, l_city string, r_city string",
    )
    g = field_agreements(cands, ["city"])
    vf = spark.createDataFrame(
        [("city", "oldcity", 4)],
        "field string, value string, n_value_pairs long",
    )
    params = {"city": (0.95, 0.25)}
    row = fs_score_tf(g, params, vf, 16).collect()[0]
    assert row["bayes_factor"] == 0.95 / 0.25


def test_fs_score_tf_guards(spark):
    from el.linkage import field_agreements, fs_score_tf

    cands = spark.createDataFrame(
        [(1, 1, "a", "a")],
        "l_id long, r_id long, l_city string, r_city string",
    )
    g = field_agreements(cands, ["city"])
    vf = spark.createDataFrame(
        [("city", "a", 1)], "field string, value string, n_value_pairs long"
    )
    with pytest.raises(ValueError, match="tf_fields not in params"):
        fs_score_tf(g, {"city": (0.9, 0.1)}, vf, 16, tf_fields=["zip"])
    with pytest.raises(ValueError, match="n_pairs"):
        fs_score_tf(g, {"city": (0.9, 0.1)}, vf, 0)
    with pytest.raises(ValueError, match="m=0.1 <= u=0.5"):
        fs_score_tf(g, {"city": (0.1, 0.5)}, vf, 16)
