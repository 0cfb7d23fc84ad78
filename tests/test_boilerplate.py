"""boilerplate_stats: grouped document-frequency boilerplate discovery."""

from __future__ import annotations

import pytest

from twitter_to_sqlite_spark.functions import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # group A: 10 docs with distinct bodies, 6 carry the same footer
    bodies = [f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(10)]
    for i, b in enumerate(bodies):
        txt = b + (" join our newsletter" if i < 6 else "")
        rows.append((i, "a", txt))
    # group B: fully distinct docs, no boilerplate
    for i in range(5):
        rows.append((100 + i, "b", f"epsilon{i} zeta{i} eta{i}"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_planted_footer_is_found(spark, corpus):
    got = {r["source"]: r for r in dedup.boilerplate_stats(
        corpus, "source", "doc_id", "text", k=2, min_frac=0.5).collect()}
    a = got["a"]
    # exactly the two footer bigrams ('join our', 'our newsletter')
    # clear the 50% bar — the body/footer boundary bigram is unique
    # per doc ('deltaN join') and every body bigram is unique
    assert a["n_docs"] == 10
    assert a["n_boiler"] == 2
    assert a["boiler_occ_frac"] > 0
    b = got["b"]
    assert b["n_boiler"] == 0
    assert b["boiler_occ_frac"] == 0.0


def test_threshold_is_inclusive(spark, corpus):
    # 6/10 docs carry the footer: min_frac=0.6 still flags it,
    # min_frac just above does not
    hi = {r["source"]: r for r in dedup.boilerplate_stats(
        corpus, "source", "doc_id", "text", k=2, min_frac=0.6).collect()}
    assert hi["a"]["n_boiler"] == 2
    none = {r["source"]: r for r in dedup.boilerplate_stats(
        corpus, "source", "doc_id", "text", k=2, min_frac=0.61).collect()}
    assert none["a"]["n_boiler"] == 0


def test_occurrence_fraction_accounts_occurrences(spark, corpus):
    a = {r["source"]: r for r in dedup.boilerplate_stats(
        corpus, "source", "doc_id", "text", k=2, min_frac=0.5).collect()}["a"]
    # footer bigrams occur 6 times each = 12 boiler occurrences;
    # bodies contribute 3 bigrams x 10 docs, footer docs add a
    # boundary bigram + 2 footer bigrams each
    total_occ = 3 * 10 + 6 * 3
    assert a["boiler_occ_frac"] == pytest.approx(12 / total_occ, abs=1e-6)
