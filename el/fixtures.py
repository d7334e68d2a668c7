"""Deterministic synthetic web_pages corpus + evaluation labels.

BASELINE.json input_hint mandates the exact input shape
``(url, warc_ts, html, text, lang)``; no external data exists, so the
corpus is a pure function of ``(n_pages, seed)`` built from hash
streams (el.hashing) — identical bytes per url across runs,
partitionings, and parallelism levels (SURVEY.md §0 byte-identity
invariant). Generation runs distributed via ``mapInPandas`` over
``spark.range`` (string assembly is batch-level Python inside an
Arrow batch, never row-at-a-time ``F.udf``).

Corpus model (FIXTURES.md §A):
- entity universe ``E = max(20, n_pages // 6)``; each entity has a
  2-4 token pseudo-word name and a latent topic in [0, 10);
- name tokens are unique per (entity, slot) => different entities
  never share a name token, EXCEPT 5 planted name-collision entity
  pairs (same name, different topic) that make topic context
  load-bearing for F1 >= 0.99;
- 3 hot entities absorb ~5% of pages (block skew -> exercises salting
  and per-block caps);
- mention surfaces are corrupted deterministically per page: token
  reorder, trailing-token abbreviation ("<tok>." of first 4 chars),
  1-char typos at position >= 4 (so every token's 4-char prefix is
  corruption-invariant — the name_token blocking key), ALLCAPS, and
  comma insertion;
- page filler text is drawn from the entity's topic vocabulary
  (lowercase), so TF-IDF/LDA context separates same-name entities;
- ~2% of pages are re-crawls: duplicate url of an earlier page with
  identical content and a later warc_ts (exercises latest-wins dedup);
- ~1% of pages have no <p> content => text is NULL;
- lang in {en, fr, es, de, zh}, skewed to en; the pipeline gates on en.
"""

from __future__ import annotations

import html as html_mod
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from el.hashing import h64, hchoice, u01
from el.schemas import LABELED_PAIRS, WEB_PAGES

N_TOPICS = 10
N_HOT = 3
N_COLLISIONS = 5
HOT_FRAC = 0.05
RECRAWL_FRAC = 0.02
NULL_TEXT_FRAC = 0.01

_CONS = "bcdfgklmnprstvz"
_VOWS = "aeiou"
_SYLS = [c + v for c in _CONS for v in _VOWS]  # 75 syllables

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)

_LANGS = ("en", "fr", "es", "de", "zh")
_LANG_CDF = (0.55, 0.70, 0.82, 0.92, 1.01)


def pseudo_word(idx: int) -> str:
    """Injective 3-syllable word for a non-negative index (< 75**3)."""
    s = len(_SYLS)
    a, b, c = idx % s, (idx // s) % s, (idx // (s * s)) % s
    return _SYLS[a] + _SYLS[b] + _SYLS[c]


def topic_vocab(topic: int, size: int = 24) -> list[str]:
    return [pseudo_word(10_000_000 + topic * 64 + k) for k in range(size)]


def common_vocab(size: int = 30) -> list[str]:
    return [pseudo_word(20_000_000 + k) for k in range(size)]


def build_universe(
    n_pages: int, seed: int = 42, prefix_typo_p: float = 0.0
) -> dict:
    """Entity universe: names, topics, collisions, hot ids.

    Pure function of (n_pages, seed, prefix_typo_p); small (O(E)) —
    broadcast to executors via closure capture. prefix_typo_p > 0
    selects the TYPO-HEAVY tier: surfaces additionally get vowel
    substitutions INSIDE the 4-char prefix (soundex-invariant but
    prefix4-breaking) with that probability — the tier where the
    soundex blocking strategy is load-bearing, not just additive.
    """
    E = max(20, n_pages // 6)
    ids = np.arange(E, dtype=np.uint64)
    topics = hchoice(ids, N_TOPICS, salt=101, seed=seed)
    ntok = 2 + hchoice(ids, 3, salt=102, seed=seed)
    names: list[list[str]] = [
        [pseudo_word(int(e) * 4 + s) for s in range(int(ntok[e]))] for e in range(E)
    ]
    # planted collisions: entity 2c+1 takes entity 2c's name, other topic
    for c in range(N_COLLISIONS):
        a, b = 2 * c, 2 * c + 1
        names[b] = list(names[a])
        topics[b] = (topics[a] + 5) % N_TOPICS
    hot_ids = [E - 1 - k for k in range(N_HOT)]
    return {
        "E": E,
        "names": names,
        "topics": topics.astype(np.int64),
        "hot_ids": hot_ids,
        "topic_vocabs": [topic_vocab(t) for t in range(N_TOPICS)],
        "common": common_vocab(),
        "seed": seed,
        "prefix_typo_p": prefix_typo_p,
    }


# ---------------------------------------------------------------------------
# per-page deterministic attributes (shared by generator and label builder)
# ---------------------------------------------------------------------------


def _recrawl_redirect(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(owner_id, is_recrawl): a recrawl row re-serves an earlier
    non-recrawl page's url+content with a later capture timestamp."""
    ids = ids.astype(np.int64)
    flag = (u01(ids.astype(np.uint64), 14, seed) < RECRAWL_FRAC) & (ids > 0)
    span = np.maximum(np.minimum(ids, 50), 1)
    j = ids - 1 - (h64(ids.astype(np.uint64), 15, seed) % span.astype(np.uint64)).astype(
        np.int64
    )
    j = np.clip(j, 0, None)
    target_flag = (u01(j.astype(np.uint64), 14, seed) < RECRAWL_FRAC) & (j > 0)
    eff = flag & ~target_flag
    owner = np.where(eff, j, ids)
    return owner, eff


def _page_attrs(owner: np.ndarray, uni: dict) -> dict:
    """Vectorized content attributes for url-owner ids."""
    seed = uni["seed"]
    E = uni["E"]
    o = owner.astype(np.uint64)
    u_hot = u01(o, 11, seed)
    hot_pick = hchoice(o, N_HOT, 12, seed)
    normal_pick = hchoice(o, max(E - N_HOT, 1), 13, seed)
    eid = np.where(
        u_hot < HOT_FRAC, np.int64(E - 1) - hot_pick, normal_pick
    ).astype(np.int64)
    lang_u = u01(o, 16, seed)
    lang_idx = np.searchsorted(np.array(_LANG_CDF), lang_u, side="right")
    null_text = u01(o, 17, seed) < NULL_TEXT_FRAC
    um = u01(o, 18, seed)
    n_sec = np.where(um < 0.10, 2, np.where(um < 0.35, 1, 0)).astype(np.int64)
    src = hchoice(o, 20, 19, seed)
    return {
        "eid": eid,
        "lang_idx": lang_idx,
        "null_text": null_text,
        "n_sec": n_sec,
        "src": src,
    }


def _url(owner: int, src: int) -> str:
    return f"https://src{src}.example.com/page/{owner:08d}"


def _corrupt_surface(
    owner: int,
    slot: int,
    tokens: list[str],
    seed: int,
    prefix_typo_p: float = 0.0,
) -> str:
    """Deterministic surface corruption; in the default tier every
    token's first-4-char prefix survives (typos land at position >= 4,
    abbreviation keeps the first 4 chars), so name_token blocking
    recall holds by construction. prefix_typo_p > 0 (typo-heavy tier)
    additionally substitutes a vowel INSIDE the prefix (position 1 or
    3 — names are CVCVCV syllables) with another vowel: the soundex
    code is unchanged (vowels are skipped) while the prefix4 key
    drifts, making soundex blocking load-bearing."""
    key = np.uint64(owner * 16 + slot)

    def u(salt: int) -> float:
        return float(u01(np.array([key]), salt, seed)[0])

    def h(salt: int, mod: int) -> int:
        return int(h64(np.array([key]), salt, seed)[0] % np.uint64(max(mod, 1)))

    toks = list(tokens)
    if prefix_typo_p and u(210) < prefix_typo_p:
        ti = h(211, len(toks))
        t = toks[ti]
        vpos = 1 + 2 * h(212, 2)  # char 1 or 3: a vowel by construction
        if len(t) > vpos and t[vpos] in "aeiou":
            alts = [v for v in "aeiou" if v != t[vpos]]
            toks[ti] = t[:vpos] + alts[h(213, len(alts))] + t[vpos + 1 :]
    if len(toks) >= 3 and u(201) < 0.10:  # rotate (token reorder)
        toks = toks[1:] + toks[:1]
    if u(202) < 0.25:  # 1-char typo at position >= 4
        ti = h(203, len(toks))
        t = toks[ti]
        if len(t) > 4:
            pos = 4 + h(204, len(t) - 4)
            kind = h(205, 2)
            if kind == 0 and pos + 1 < len(t):  # adjacent swap
                t = t[:pos] + t[pos + 1] + t[pos] + t[pos + 2 :]
            else:  # substitution
                t = t[:pos] + _CONS[h(206, len(_CONS))] + t[pos + 1 :]
            toks[ti] = t
    if u(207) < 0.15 and len(toks[-1]) >= 6:  # abbreviate last token
        toks[-1] = toks[-1][:4] + "."
    if u(208) < 0.05:  # ALLCAPS variant
        toks = [t.upper() for t in toks]
    else:
        toks = [t[:1].upper() + t[1:] for t in toks]
    if u(209) < 0.10 and len(toks) >= 2:  # comma insertion
        toks[0] = toks[0] + ","
    return " ".join(toks)


def _secondary_entity(owner: int, slot: int, eid: int, E: int, seed: int) -> int:
    e = int(
        h64(np.array([np.uint64(owner * 16 + slot)]), 210, seed)[0] % np.uint64(E)
    )
    return (e + 1) % E if e == eid else e


def _page_text(owner: int, attrs_row: dict, uni: dict) -> str | None:
    """Full page text: topic filler sentences with mention surfaces
    planted as Capitalized runs (filler is all lowercase, so the
    extractor's capitalized-run heuristic recovers exactly the planted
    surfaces). Single-spaced => byte-identical under EXTRACT_SPEC v1."""
    if attrs_row["null_text"]:
        return None
    seed = uni["seed"]
    eid = int(attrs_row["eid"])
    topic = int(uni["topics"][eid])
    tv = uni["topic_vocabs"][topic]
    cv = uni["common"]
    key = np.uint64(owner)
    n_fill = 40
    fill_idx = h64(
        np.arange(n_fill, dtype=np.uint64) + key * np.uint64(37), 300, seed
    )
    words = [
        tv[int(fill_idx[i] % np.uint64(len(tv)))]
        if i % 5 != 4
        else cv[int(fill_idx[i] % np.uint64(len(cv)))]
        for i in range(n_fill)
    ]
    ppref = float(uni.get("prefix_typo_p", 0.0))
    mentions = [_corrupt_surface(owner, 0, uni["names"][eid], seed, ppref)]
    for s in range(int(attrs_row["n_sec"])):
        se = _secondary_entity(owner, s + 1, eid, uni["E"], seed)
        mentions.append(
            _corrupt_surface(owner, s + 1, uni["names"][se], seed, ppref)
        )
    parts: list[str] = []
    w = iter(words)
    parts.append(" ".join(next(w) for _ in range(5)) + ".")
    for m in mentions:
        parts.append(m + " " + " ".join(next(w) for _ in range(4)) + ".")
    rest = list(w)
    for i in range(0, len(rest), 6):
        chunk = rest[i : i + 6]
        if chunk:
            parts.append(" ".join(chunk) + ".")
    return " ".join(parts)


_BOILER_NAV = "home about products contact"
_BOILER_FOOT = "copyright example inc all rights reserved"


def _page_html(owner: int, text: str | None, src: int, title_tok: str) -> bytes:
    body = f"<p>{html_mod.escape(text)}</p>" if text is not None else "<div>no content</div>"
    doc = (
        f"<html><head><title>{title_tok} src{src}</title>"
        f'<style>body{{margin:0}}</style><script>var x=1;</script></head>'
        f"<body><nav>{_BOILER_NAV}</nav>{body}"
        f"<footer>{_BOILER_FOOT}</footer></body></html>"
    )
    return doc.encode("utf-8")


def _ts(owner: np.ndarray, ids: np.ndarray, recrawl: np.ndarray) -> list[datetime]:
    out = []
    for o, i, r in zip(owner.tolist(), ids.tolist(), recrawl.tolist()):
        t = _EPOCH + timedelta(seconds=7 * int(o))
        if r:
            t += timedelta(days=30, seconds=int(i) % 86400)
        out.append(t)
    return out


def gen_web_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    num_partitions: int | None = None,
    prefix_typo_p: float = 0.0,
) -> DataFrame:
    """Distributed deterministic corpus: mapInPandas over spark.range.

    Every row is a pure function of its id — results are independent
    of partition count (tested under local[8] vs local[32]).
    prefix_typo_p selects the typo-heavy tier (build_universe)."""
    uni = build_universe(n_pages, seed, prefix_typo_p)
    parts = num_partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64)
            owner, recrawl = _recrawl_redirect(ids, seed)
            attrs = _page_attrs(owner, uni)
            rows = {
                "url": [],
                "warc_ts": _ts(owner, ids, recrawl),
                "html": [],
                "text": [],
                "lang": [],
            }
            for k in range(len(ids)):
                o = int(owner[k])
                row = {
                    "eid": attrs["eid"][k],
                    "null_text": bool(attrs["null_text"][k]),
                    "n_sec": attrs["n_sec"][k],
                }
                text = _page_text(o, row, uni)
                src = int(attrs["src"][k])
                rows["url"].append(_url(o, src))
                rows["html"].append(
                    _page_html(o, text, src, uni["names"][int(attrs["eid"][k])][0])
                )
                rows["text"].append(text)
                rows["lang"].append(_LANGS[min(int(attrs["lang_idx"][k]), 4)])
            yield pd.DataFrame(rows)

    return spark.range(n_pages, numPartitions=parts).mapInPandas(
        gen, schema=WEB_PAGES
    )


# ---------------------------------------------------------------------------
# labeled pairs (driver-side; label tiers are <= a few thousand pages)
# ---------------------------------------------------------------------------


def gen_labeled_pairs(
    spark: SparkSession, n_pages: int, seed: int = 42
) -> DataFrame:
    """Evaluation labels over en, non-null, non-recrawl pages.

    positives: all same-entity page pairs (same name_token block by
    construction); negatives: all collision-pair cross products (same
    name, different topic) + sampled same-topic different-entity pairs.
    """
    uni = build_universe(n_pages, seed)
    ids = np.arange(n_pages, dtype=np.int64)
    owner, recrawl = _recrawl_redirect(ids, seed)
    attrs = _page_attrs(owner, uni)
    keep = (
        (~recrawl)
        & (~attrs["null_text"])
        & (attrs["lang_idx"] == 0)  # en
    )
    kept = ids[keep]
    eid = attrs["eid"][keep]
    src = attrs["src"][keep]
    urls = {int(i): _url(int(i), int(s)) for i, s in zip(kept, src)}

    by_entity: dict[int, list[int]] = {}
    for i, e in zip(kept.tolist(), eid.tolist()):
        by_entity.setdefault(int(e), []).append(int(i))

    def block_of(e: int) -> str:
        return "nt:" + sorted(uni["names"][e])[0][:4]

    rows: list[tuple[str, str, str, int]] = []
    for e, pages in sorted(by_entity.items()):
        bk = block_of(e)
        for x in range(len(pages)):
            for y in range(x + 1, len(pages)):
                a, b = urls[pages[x]], urls[pages[y]]
                if a > b:
                    a, b = b, a
                if a != b:
                    rows.append((a, b, bk, 1))
    n_pos = len(rows)

    # collision negatives: same normalized name, different topic
    for c in range(N_COLLISIONS):
        ea, eb = 2 * c, 2 * c + 1
        bk = block_of(ea)
        for pa in by_entity.get(ea, []):
            for pb in by_entity.get(eb, []):
                a, b = urls[pa], urls[pb]
                if a > b:
                    a, b = b, a
                if a != b:
                    rows.append((a, b, bk, 0))

    # same-topic different-entity negatives (topic-bucket blocks)
    by_topic: dict[int, list[int]] = {}
    for e in by_entity:
        by_topic.setdefault(int(uni["topics"][e]), []).append(e)
    need = max(0, 3 * n_pos - (len(rows) - n_pos))
    rng = np.random.default_rng(seed + 7)
    attempts = 0
    seen = set()
    while len(rows) - n_pos < need and attempts < need * 20:
        attempts += 1
        t = int(rng.integers(N_TOPICS))
        ents = by_topic.get(t, [])
        if len(ents) < 2:
            continue
        e1, e2 = rng.choice(len(ents), size=2, replace=False)
        ea, eb = ents[int(e1)], ents[int(e2)]
        if {ea, eb} in ({2 * c, 2 * c + 1} for c in range(N_COLLISIONS)):
            continue
        pa = by_entity[ea][int(rng.integers(len(by_entity[ea])))]
        pb = by_entity[eb][int(rng.integers(len(by_entity[eb])))]
        a, b = urls[pa], urls[pb]
        if a > b:
            a, b = b, a
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b, f"topic:{t}", 0))

    return spark.createDataFrame(rows, LABELED_PAIRS)
