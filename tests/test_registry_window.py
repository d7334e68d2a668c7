"""The driver grades only the first 50 registry entries. WINDOW makes
that subset an explicit curated decision (VERDICT r3 #1/#7, ADVICE r3);
these invariants ensure a new check can never silently evict another
from the graded window, and that the documented counts cannot drift."""

from __future__ import annotations

from el.queries import REGISTRY, WINDOW

# §2 operators whose oracled check must always hold a driver slot, plus
# the headline training-data ops the r3 verdict promoted.
CORE = {
    # projections / filters
    "p1_project_revenue",
    "p2_filter_orders",
    "p3_lang_gate",
    "p4_latest_event_per_user",
    # joins J1-J8
    "j1_selfjoin_docs_lang",
    "j2_salted_join",
    "j3_broadcast_nation_counts",
    "j4_semi_customers_with_orders",
    "j5_anti_customers_without_orders",
    "j6_range_join_parts",
    "j7_connected_components",
    "j8_asof_latest_event",
    # aggregations / windows / sorts / set ops
    "a1_pricing_summary",
    "a2_distinct_custkeys",
    "a4_grouped_vector_centroid",
    "a5_first_order_per_customer",
    "a6_rollup_lineitem",
    "w1_per_block_cap",
    "w2_topk_orders_per_customer",
    "w4_running_event_sum",
    "w5_price_median",
    "o1_sorted_nations",
    "o2_global_topk_orders",
    "u1_union_distinct_langs",
    "u2_intersect_keys",
    "u3_except_keys",
    # scalar fns
    "f1_normalize_names",
    "f2_tokenize_stats",
    "f4_levenshtein_parts",
    "f5_jaro_winkler_parts",
    "f9_json_extract_events",
    "f10_events_per_day",
    "f11_math_clamps",
    # headline training-data ops (r3 verdict promotions)
    "dd1_exact_dedup_docs",
    "dd4b_ngram_jaccard_minhash",
    "dd5b_embedding_neardup_lsh",
    "dd7_neardup_doc_clusters",
    "dd8_dedup_survivors",
    "ann1_cosine_topk",
    "er2_clustering_agreement",
    "lk1_link_part_names",
    "ds1_hash_split",
    # streaming batch twins
    "st2_tumbling_window_counts",
    "st3_session_window_counts",
    "st6_user_event_stats",
}


def test_window_is_exactly_the_first_50_registry_entries():
    assert list(REGISTRY)[:50] == WINDOW
    assert len(WINDOW) == 50
    assert len(set(WINDOW)) == 50


def test_window_entries_all_carry_oracles():
    assert all(REGISTRY[n].oracle is not None for n in WINDOW)


def test_core_operator_checks_hold_window_slots():
    missing = CORE - set(WINDOW)
    assert not missing, f"core checks evicted from the driver window: {missing}"


def test_oracled_checks_precede_rows_only_checks():
    # outside the window, oracled-first ordering keeps any future window
    # growth aligned with verifiable checks
    flags = [REGISTRY[n].oracle is None for n in REGISTRY]
    assert flags == sorted(flags[:50]) + sorted(flags[50:])


def test_documented_counts_match_registry():
    # README.md / COVERAGE.md quote these; keep them honest.
    n_total = len(REGISTRY)
    n_oracled = sum(1 for c in REGISTRY.values() if c.oracle is not None)
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    for doc in ("README.md", "COVERAGE.md"):
        text = (root / doc).read_text()
        m = re.search(r"(\d+) registered / (\d+) oracled", text)
        assert m, f"{doc} lost its registry-count line"
        assert int(m.group(1)) == n_total, f"{doc} total stale: {m.group(1)} != {n_total}"
        assert int(m.group(2)) == n_oracled, f"{doc} oracled stale: {m.group(2)} != {n_oracled}"
