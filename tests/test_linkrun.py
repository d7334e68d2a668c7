"""End-to-end entity-linking run (el.linkrun / jobs/run_linking.py):
anchor corpus -> prior -> NIL-aware resolution -> TAC-KBP eval."""

from __future__ import annotations

import pytest

from el.linkrun import anchor_corpus, mention_corpus, run_linking

# small but structurally faithful: 40 links/alias (even -> the
# planted 50/50 aliases tie EXACTLY), 20 aliases, 260 mentions
LINKS, ALIASES, MENTIONS = 800, 20, 260


@pytest.fixture(scope="module")
def result(spark):
    return run_linking(
        spark, n_links=LINKS, n_aliases=ALIASES, n_mentions=MENTIONS
    )


def test_linking_run_never_links_wrongly(result):
    # NIL absorbs ALL uncertainty: every emitted link is correct and
    # every true-NIL mention is answered NIL
    assert result["eval"]["kb_p"] == 1.0
    assert result["eval"]["nil_r"] == 1.0


def test_linking_run_recall_and_accuracy_floors(result):
    # misses are EXACTLY the planted 50/50 aliases (k%9==0: 3 of 20
    # aliases here) -> ambiguous NIL, the designed recall tax
    assert result["eval"]["kb_r"] > 0.8
    assert result["eval"]["accuracy"] > 0.85
    assert set(result["nil_reasons"]) == {"ambiguous", "no_evidence"}
    # every 13th mention is evidence-free and must be NIL no_evidence
    assert result["nil_reasons"]["no_evidence"] == 20


def test_linking_run_stage_accounting(result):
    assert result["stages"]["resolve"]["rows"] == MENTIONS
    assert result["eval"]["n_mentions"] == MENTIONS
    assert result["eval"]["n_correct_nil"] == 20
    assert result["mentions_per_sec"] > 0


def test_corpora_deterministic_across_partitionings(spark):
    a1 = anchor_corpus(spark, LINKS, ALIASES, num_partitions=2)
    a2 = anchor_corpus(spark, LINKS, ALIASES, num_partitions=16)
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
    m1 = mention_corpus(spark, MENTIONS, ALIASES, num_partitions=3)
    m2 = mention_corpus(spark, MENTIONS, ALIASES, num_partitions=13)
    assert m1.exceptAll(m2).count() == 0 and m2.exceptAll(m1).count() == 0


def test_run_is_reproducible(spark, result):
    again = run_linking(
        spark, n_links=LINKS, n_aliases=ALIASES, n_mentions=MENTIONS
    )
    assert again["eval"] == result["eval"]
    assert again["nil_reasons"] == result["nil_reasons"]
