"""EXTRACT_SPEC v1: byte-identity of extracted text, and mention
extraction shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from el.extract import add_extracted_text, extract_mentions, extract_text_py
from el.fixtures import gen_web_pages
from el.pipeline import PipelineConfig, mentions_stage


def test_extract_byte_identity(spark):
    pages = gen_web_pages(spark, 400)
    ext = add_extracted_text(pages)
    bad = ext.where(
        (
            F.col("text").isNotNull() & (F.col("extracted") != F.col("text"))
        )
        | (F.col("text").isNull() & F.col("extracted").isNotNull())
        | (F.col("text").isNotNull() & F.col("extracted").isNull())
    ).count()
    assert bad == 0


def test_extract_pure_function_examples():
    assert extract_text_py(None) is None
    assert extract_text_py(b"<html><body>no paragraph</body></html>") is None
    got = extract_text_py(
        b"<html><script>var x='<p>trap</p>';</script>"
        b"<body><nav>chrome</nav><p> a  b\nc </p><p>d &amp; e</p>"
        b"<footer>f</footer></body></html>"
    )
    assert got == "a b c d & e"


def test_mentions_shape(spark):
    pages = gen_web_pages(spark, 300)
    mentions = mentions_stage(pages, PipelineConfig(use_lsh=False))
    rows = mentions.collect()
    assert len(rows) > 100
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    for url, ms in by_url.items():
        idxs = sorted(m["mention_idx"] for m in ms)
        assert idxs == list(range(len(ms)))  # dense, primary = 0
        assert len({m["mention_id"] for m in ms}) == len(ms)
        for m in ms:
            assert m["surface"][0].isupper()
            assert m["norm_name"] == " ".join(sorted(m["name_tokens"]))
            # context carries no capitalized (mention) tokens
            assert m["context"] == m["context"].lower()


def test_mention_ids_stable_across_runs(spark):
    pages = gen_web_pages(spark, 200)
    cfg = PipelineConfig(use_lsh=False)
    a = {
        (r["url"], r["mention_idx"]): r["mention_id"]
        for r in mentions_stage(pages, cfg).collect()
    }
    b = {
        (r["url"], r["mention_idx"]): r["mention_id"]
        for r in mentions_stage(gen_web_pages(spark, 200, num_partitions=3), cfg).collect()
    }
    assert a == b
