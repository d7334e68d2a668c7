"""Text-analysis op properties: language-ID on crafted texts, quality
bounds, token-count edges, fingerprint invariance, winnowing parity
and containment behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from el.textops import (
    content_fingerprint,
    language_id,
    quality_score,
    token_stats,
    winnow_fingerprints,
    winnow_py,
)


def test_language_id_crafted(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy with that"),
        (2, "le chat est dans la maison et les oiseaux dans un arbre"),
        (3, "el gato y el perro en la casa que los ninos quieren"),
        (4, "der hund und die katze sind mit den kindern zu haus"),
        (5, "zzz qqq xxx 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "es", 4: "de", 5: "und"}


def test_quality_score_bounds(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 6),
        (2, "!!! ??? ... ###"),
        (3, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_score(df).collect()}
    for r in out.values():
        assert 0.0 <= r.quality <= 1.0
    assert out[1].quality > out[2].quality  # prose beats punct soup


def test_token_stats_edges(spark):
    rows = [(1, "a b  c"), (2, "   "), (3, "Hello, world! 42")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in token_stats(df).collect()}
    assert got[1] == (3, 3)
    assert got[2][0] == 0
    # hello , world ! 4 2 -> 6 BPE-ish pieces
    assert got[3] == (3, 6)


def test_fingerprint_normalization_invariance(spark):
    rows = [(1, "Hello,   World!"), (2, "hello world"), (3, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.fp_md5 for r in content_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_winnow_spark_matches_python(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "ab"),  # shorter than k -> empty
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r.fingerprints for r in winnow_fingerprints(df).collect()}
    for doc_id, text in texts:
        assert got[doc_id] == winnow_py(text)


def test_winnow_overlap_detects_shared_content():
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a + " and then some extra trailing content appended here"
    c = "nothing in common with the others at all whatsoever okay"
    fa, fb, fc = set(winnow_py(a)), set(winnow_py(b)), set(winnow_py(c))
    assert len(fa & fb) / len(fa) > 0.8  # containment survives append
    assert len(fa & fc) == 0


def test_canonicalize_url_cases(spark):
    from el.textops import canonicalize_url

    cases = [
        # (raw, expected)
        (1, "HTTPS://WWW.News.Example.COM:443/A/B/#top",
         "news.example.com/A/B"),
        (2, "http://example.com/", "example.com"),
        (3, "http://example.com:8080/x", "example.com:8080/x"),  # non-default port kept
        (4, "https://example.com/p?utm_source=a&id=7&ref=rss&q=Z",
         "example.com/p?id=7&q=Z"),
        (5, "https://example.com/p?utm_campaign=x&fbclid=abc",
         "example.com/p"),  # all-tracking query dropped entirely
        (6, "  /Relative/Path  ", "/relative/path"),  # no scheme -> lower/trim
        (7, "http://WWW.ONLY.ORG", "only.org"),
        (8, "https://a.net/CaseKept/Path?Key=Val#frag",
         "a.net/CaseKept/Path?Key=Val"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_repetition_stats_crafted(spark):
    from el.textops import repetition_stats

    rows = [
        (1, "a a a a"),          # 4 words, 1 distinct, grams all "a a"
        (2, "a b c d"),          # all distinct
        (3, "x"),                # single token: no grams
        (4, "spam spam ham spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].n_words == 4
    assert got[1].distinct_word_ratio == 0.25
    assert got[1].top_word_frac == 1.0
    assert got[1].dup_2gram_frac == 1.0 - 1.0 / 3.0
    assert got[2].distinct_word_ratio == 1.0
    assert got[2].dup_2gram_frac == 0.0
    assert got[3].n_words == 1
    assert got[3].dup_2gram_frac == 0.0  # no grams -> defined as 0
    assert got[4].top_word_frac == 0.75
    assert got[4].distinct_word_ratio == 0.5


def test_scrub_pii_crafted(spark):
    from el.textops import scrub_pii

    rows = [
        (1, "mail a.b+c@x-y.co.uk and call 555-123-4567 today"),
        (2, "no pii here"),
        (3, "twice: u@e.org v@f.net, phone 555 1234 5678."),
        (4, "not-a-phone 12-34-56 and not-an-email foo@bar"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (got[1].n_emails, got[1].n_phones) == (1, 1)
    assert got[1].text_scrubbed == "mail <EMAIL> and call <PHONE> today"
    assert (got[2].n_emails, got[2].n_phones) == (0, 0)
    assert got[2].text_scrubbed == "no pii here"
    assert (got[3].n_emails, got[3].n_phones) == (2, 1)
    assert got[3].text_scrubbed == "twice: <EMAIL> <EMAIL>, phone <PHONE>."
    assert (got[4].n_emails, got[4].n_phones) == (0, 0)


def test_scrub_pii_phone_inside_email_not_double_counted(spark):
    """ADVICE r3: a phone-shaped substring inside an email local part
    is swallowed by the email replacement; n_phones must be counted on
    the email-scrubbed intermediate so counts agree with the text."""
    from el.textops import scrub_pii

    rows = [
        (1, "reach 555-123-4567@corp.example.org for help"),
        (2, "email 555-123-4567@corp.example.org or dial 555-987-6543 x9"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (got[1].n_emails, got[1].n_phones) == (1, 0)
    assert got[1].text_scrubbed == "reach <EMAIL> for help"
    assert (got[2].n_emails, got[2].n_phones) == (1, 1)
    assert got[2].text_scrubbed == "email <EMAIL> or dial <PHONE> x9"
    # invariant: counts equal the placeholders actually present
    for r in got.values():
        assert r.text_scrubbed.count("<EMAIL>") == r.n_emails
        assert r.text_scrubbed.count("<PHONE>") == r.n_phones


def test_canonicalize_url_variant_invariance(spark):
    """Contract: every noise variant of a URL (scheme case, www,
    default port, tracking params, fragment, trailing slash) maps to
    the SAME canonical key, and distinct pages keep distinct keys.
    200 seeded random cases, one Spark job."""
    import random

    from el.textops import canonicalize_url

    rng = random.Random(42)
    rows = []
    for base_id in range(200):
        host = f"sub{rng.randrange(50)}.site{base_id}.org"
        path = "/" + "/".join(
            rng.choice(["A", "b", "Cc", "d9"]) for _ in range(rng.randrange(1, 4))
        )
        keep_q = f"id={base_id}" if rng.random() < 0.5 else ""
        for variant in range(3):
            scheme = rng.choice(["http://", "https://", "HTTP://", "HTTPS://"])
            www = rng.choice(["", "www.", "WWW."])
            port = rng.choice(["", ":80", ":443"])
            trail = rng.choice(["", "/", "//"])
            noise = rng.choice(
                ["", "utm_source=x", "fbclid=zzz", "utm_a=1&gclid=2"]
            )
            q = "&".join(p for p in (noise, keep_q) if p)
            frag = rng.choice(["", "#top", "#a/b?c"])
            url = f"{scheme}{www}{host}{port}{path}{trail}"
            if q:
                url += f"?{q}"
            url += frag
            rows.append((base_id, variant, url))
    df = spark.createDataFrame(rows, "base long, variant long, url string")
    got = df.select(
        "base", "variant", canonicalize_url(F.col("url")).alias("c")
    ).collect()
    by_base = {}
    for r in got:
        by_base.setdefault(r.base, set()).add(r.c)
    # all variants of one page collapse to exactly one key
    assert all(len(v) == 1 for v in by_base.values()), {
        k: v for k, v in by_base.items() if len(v) != 1
    }
    # distinct pages stay distinct
    keys = [next(iter(v)) for v in by_base.values()]
    assert len(set(keys)) == len(keys)


def test_compression_ratio_matches_stdlib_and_flags_repetition(spark):
    import zlib

    from el.textops import compression_ratio

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 3),
        (2, "spam " * 400),          # highly repetitive -> tiny ratio
        (3, ""),                      # empty -> NULL ratio, 0 bytes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df).collect()}
    for i, t in rows[:2]:
        raw = t.encode("utf-8")
        assert out[i].n_bytes == len(raw)
        assert out[i].ratio == len(zlib.compress(raw, 6)) / len(raw)
    # empty text: 0 bytes, NULL ratio (never a divide-by-zero)
    assert out[3].n_bytes == 0 and out[3].ratio is None
    # repetition separates hard from normal prose
    assert out[2].ratio < 0.1 < out[1].ratio


def test_nfc_normalize_composed_equals_decomposed(spark):
    from el.textops import nfc_normalize_text

    decomposed = "cafe\u0301 re\u0301sume\u0301"  # e + combining acute
    composed = "caf\u00e9 r\u00e9sum\u00e9"  # precomposed
    rows = [(1, decomposed), (2, composed), (3, "plain ascii"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in nfc_normalize_text(df).collect()}
    assert got[1].text_nfc == composed and got[1].changed is True
    assert got[2].text_nfc == composed and got[2].changed is False
    assert got[3].changed is False
    assert got[4].text_nfc is None
    # the repaired forms now exact-dedup together
    assert got[1].text_nfc == got[2].text_nfc


def test_bigram_rarity_crafted(spark):
    """Hand-checked corpus-LM rarity: 'common phrase here' appears in
    3 docs (its bigrams have corpus count 3), doc 3 adds a hapax tail
    whose bigrams occur once; doc 4 is a single token (no bigrams)."""
    from el.textops import bigram_rarity, corpus_bigram_counts

    rows = [
        (1, "common phrase here"),
        (2, "common phrase here"),
        (3, "common phrase here unique gibberish tail"),
        (4, "solo"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in bigram_rarity(d, corpus_bigram_counts(d)).collect()
    }
    # docs 1/2: bigrams (common,phrase),(phrase,here) each count 3
    for i in (1, 2):
        assert out[i].n_bigrams == 2 and out[i].n_rare == 0
        assert out[i].sum_count == 6 and out[i].avg_count == 3.0
        assert out[i].rare_frac == 0.0
    # doc 3: 5 bigrams; the first two shared (count 3), the last three
    # hapax (count 1) -> rare_frac 3/5, sum 3+3+1+1+1
    assert out[3].n_bigrams == 5 and out[3].n_rare == 3
    assert out[3].rare_frac == 3 / 5 and out[3].sum_count == 9
    # doc 4: no bigrams, zeroed stats, guarded divisions
    assert out[4].n_bigrams == 0 and out[4].n_rare == 0
    assert out[4].rare_frac == 0.0 and out[4].avg_count == 0.0
    # self-fit: every bigram exists in the counts table by construction
    assert all(r.n_unseen == 0 for r in out.values())


def test_bigram_rarity_cross_corpus_unseen(spark):
    """The persisted-artifact path (r4 verdict #1): score NEW documents
    against an OLD fit. Bigrams absent from the fit have corpus count 0
    — maximally rare — so a planted gibberish doc whose bigrams the fit
    has never seen must score HIGHEST, with its novelty surfaced as
    n_unseen; a doc made of fit-corpus boilerplate must score ~0."""
    from el.textops import bigram_rarity, corpus_bigram_counts

    fit_rows = [(i, "the quick brown fox jumps over the lazy dog")
                for i in range(1, 6)]
    fit = spark.createDataFrame(fit_rows, "doc_id long, text string")
    counts = corpus_bigram_counts(fit)
    new_rows = [
        # pure fit-corpus boilerplate: every bigram seen 5 times
        (101, "the quick brown fox jumps over the lazy dog"),
        # planted OCR gibberish: no bigram exists in the fit
        (102, "zxqv wmfr ktjp blnd qqzz vvkk"),
        # half seen, half novel
        (103, "the quick brown fox zzyy xxww"),
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_rarity(new, counts).collect()}
    # boilerplate: nothing rare, nothing unseen
    assert out[101].n_rare == 0 and out[101].n_unseen == 0
    assert out[101].rare_frac == 0.0
    # gibberish: all 5 bigrams unseen -> all rare -> rare_frac 1.0,
    # and unseen bigrams contribute 0 to sum_count
    assert out[102].n_bigrams == 5
    assert out[102].n_unseen == 5 and out[102].n_rare == 5
    assert out[102].rare_frac == 1.0 and out[102].sum_count == 0
    # mixed doc sits strictly between; gibberish ranks HIGHEST
    assert 0.0 < out[103].rare_frac < 1.0
    assert out[103].n_unseen == 2  # (fox,zzyy) and (zzyy,xxww)
    ranked = sorted(out.values(), key=lambda r: -r.rare_frac)
    assert ranked[0].doc_id == 102


def test_bigram_counts_model_roundtrip_and_determinism(spark, tmp_path):
    """VERDICT r4 #5: the counts table is a persisted model artifact.
    (a) save -> load -> score equals the in-memory fit's score;
    (b) fit is partitioning-invariant (exact-integer groupBy);
    (c) fit_or_load refuses a param-mismatched artifact;
    (d) fit_or_load is idempotent (second call loads, not refits)."""
    import pytest

    from el.textops import BigramCountsModel

    rows = [(i, f"alpha beta gamma doc {i % 7} tail words") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    model = BigramCountsModel.fit(d)
    mem = {(r.doc_id, r.n_rare, r.n_unseen, r.sum_count)
           for r in model.score(d).collect()}

    path = str(tmp_path / "lm1_model")
    saved = model.save(path)
    loaded = BigramCountsModel.load(spark, path)
    assert loaded.meta == model.meta
    got = {(r.doc_id, r.n_rare, r.n_unseen, r.sum_count)
           for r in loaded.score(d).collect()}
    assert got == mem
    # saved returns the re-bound-to-parquet model; same result
    assert {(r.doc_id, r.n_rare, r.n_unseen, r.sum_count)
            for r in saved.score(d).collect()} == mem

    # (b) partitioning-invariant fit: same counts table at 1 and 7 parts
    c1 = sorted(
        map(tuple, BigramCountsModel.fit(d.repartition(1)).counts.collect())
    )
    c7 = sorted(
        map(tuple, BigramCountsModel.fit(d.repartition(7)).counts.collect())
    )
    assert c1 == c7 and c1 == sorted(map(tuple, loaded.counts.collect()))

    # (c) param mismatch raises instead of silently mis-scoring
    with pytest.raises(ValueError, match="mismatched"):
        BigramCountsModel.fit_or_load(spark, d, path, seed="other")

    # (d) idempotent: matching params load the artifact (no refit —
    # the returned counts read the committed parquet)
    again = BigramCountsModel.fit_or_load(spark, d, path, seed="lm")
    assert "parquet" in again.counts.inputFiles()[0]


def test_gopher_rules_crafted(spark):
    import pytest

    from el.textops import gopher_rules

    good = ("the data and " + "pipeline table scan " * 20).strip()  # 63 words
    rows = [
        (1, good),                                   # passes every rule
        (2, "short text the and"),                   # word-count floor
        (3, "- the one\n- two and\n- three of"),     # all-bullet lines
        (4, "the first part ...\nthe second bit ...\nthe third ...\nplain"),
        (5, "## " * 60 + good),                      # symbol ratio
        (6, "123 456 789 " * 30 + "the and"),        # alpha-word floor
        (7, "table scan merge " * 25),               # no stopwords
        (8, "...---!!!"),                            # zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df).collect()}

    assert out[1].gopher_pass
    assert out[1].n_lines == 1 and out[1].bullet_line_frac == 0.0
    assert not out[2].gopher_pass and out[2].n_words == 4
    assert out[3].bullet_line_frac == 1.0 and not out[3].gopher_pass
    assert out[4].ellipsis_line_frac == 0.75 and not out[4].gopher_pass
    assert out[5].symbol_word_ratio > 0.1 and not out[5].gopher_pass
    assert out[6].alpha_word_frac < 0.8 and not out[6].gopher_pass
    assert out[7].n_stop_hits == 0 and not out[7].gopher_pass
    # zero-token doc: NULL ratios, pass is FALSE (not null)
    assert out[8].n_words == 0 and out[8].mean_word_len is None
    assert out[8].gopher_pass is False

    # threshold overrides change the verdict; unknown keys raise
    relaxed = {
        r.doc_id: r.gopher_pass
        for r in gopher_rules(df, min_words=3, min_stop_hits=1).collect()
    }
    assert relaxed[2]
    with pytest.raises(ValueError, match="unknown gopher"):
        gopher_rules(df, max_wordz=1)


def test_host_stats_null_and_dup_accounting(spark):
    """host_stats: an all-null host reports 0.0 means (no division by
    zero), within-host exact dups shrink n_distinct_texts and raise
    dup_rate, and char totals count only non-null text."""
    from el.textops import host_stats

    rows = [
        ("h1", "en", "aaaa"),      # 4 chars
        ("h1", "de", "aaaa"),      # exact dup of the first
        ("h1", "en", "bbbbbb"),    # 6 chars
        ("h1", "en", None),
        ("h2", "en", None),
        ("h2", "en", None),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r.host: r.asDict() for r in host_stats(df).collect()}

    h1 = got["h1"]
    assert (h1["n_docs"], h1["n_null"], h1["total_chars"]) == (4, 1, 14)
    assert h1["n_distinct_texts"] == 2 and h1["n_langs"] == 2
    assert abs(h1["mean_chars"] - 14 / 3) < 1e-12
    assert abs(h1["dup_rate"] - (1 - 2 / 3)) < 1e-12

    h2 = got["h2"]
    assert (h2["n_docs"], h2["n_null"]) == (2, 2)
    assert h2["mean_chars"] == 0.0 and h2["dup_rate"] == 0.0
    assert h2["n_distinct_texts"] == 0


def test_blocklist_filter_suffix_semantics(spark):
    """blocklist_filter: an entry blocks the exact host and every
    subdomain (suffix-chain semantics), non-matching siblings and
    NULL hosts survive, and survivors + blocked partition the
    non-null input."""
    from el.textops import blocklist_filter, host_suffix_chain

    rows = [
        (1, "evil.com"),            # exact match
        (2, "a.evil.com"),          # subdomain of entry
        (3, "deep.a.evil.com"),     # deeper subdomain
        (4, "notevil.com"),         # suffix-of-STRING but not of chain
        (5, "ads.tracker.net"),     # exact entry
        (6, "tracker.net"),         # parent of an exact entry: survives
        (7, None),                  # no authority: kept
        (8, "fine.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    bl = spark.createDataFrame(
        [("evil.com",), ("ads.tracker.net",)], "blocked_host string"
    )
    kept = {r.doc_id for r in blocklist_filter(df, bl).collect()}
    assert kept == {4, 6, 7, 8}

    chain = df.where(F.col("host") == "deep.a.evil.com").select(
        host_suffix_chain(F.col("host")).alias("c")
    ).collect()[0]["c"]
    assert chain == ["deep.a.evil.com", "a.evil.com", "evil.com", "com"]


def test_c4_clean_crafted(spark):
    from el.textops import c4_clean

    rows = [
        # every line survives; 2 sentences only -> fails min_sentences
        (1, "the quick brown fox jumps over dogs.\n"
            "does the lazy dog mind the fox at all?"),
        # 3 good sentences -> passes
        (2, "one two three four five six.\n"
            "seven eight nine ten eleven twelve!\n"
            'he said "this line ends in a quote."'),
        # line rules: no terminal punct / <5 words / javascript
        (3, "this line has plenty of words but no terminal punct\n"
            "short line here.\n"
            "please enable JavaScript to view this content.\n"
            "   this line survives with surrounding whitespace.   \n"
            "another good line follows right after this one.\n"
            "a third good sentence keeps the page alive today."),
        # lorem ipsum kills the page even with good lines
        (4, "one two three four five six.\n"
            "seven eight nine ten eleven twelve.\n"
            "standard Lorem Ipsum passage filler text goes here today."),
        # curly brace kills the page
        (5, "one two three four five six.\n"
            "seven eight nine ten eleven twelve.\n"
            "thirteen fourteen fifteen sixteen seventeen eighteen.\n"
            "window.config = { ads: true };"),
        (6, None),  # null text: no output row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}

    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_kept == 2 and out[1].n_sentences == 2
    assert not out[1].c4_pass
    assert out[2].n_kept == 3 and out[2].c4_pass
    # doc 3: only the 3 prose lines survive, trimmed
    assert out[3].n_lines == 6 and out[3].n_kept == 3
    assert out[3].clean_text.split("\n")[0] == (
        "this line survives with surrounding whitespace."
    )
    assert out[3].c4_pass
    assert out[4].n_kept == 3 and not out[4].c4_pass   # lorem ipsum
    assert out[5].n_kept == 3 and not out[5].c4_pass   # curly brace
    # the brace line itself was dropped at line level (ends in ';')
    assert "{" not in out[5].clean_text

    # threshold knobs
    relaxed = {
        r.doc_id: r
        for r in c4_clean(df, min_line_words=3, min_sentences=2).collect()
    }
    assert relaxed[1].c4_pass                  # 2 sentences now enough
    assert relaxed[3].n_kept == 4              # "short line here." back in
