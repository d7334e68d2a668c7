"""Text-analysis op properties: language-ID on crafted texts, quality
bounds, token-count edges, fingerprint invariance, winnowing parity
and containment behavior."""

from __future__ import annotations

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
