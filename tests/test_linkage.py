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
