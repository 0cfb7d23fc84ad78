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


# ---------------------------------------------------------------------
# paragraph_dedup (r6): corpus-wide repeated-paragraph removal
# ---------------------------------------------------------------------

FOOTER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def para_corpus(spark):
    rows = [
        (1, "unique intro one\n\n" + FOOTER + "\n\nunique body one"),
        (2, "unique intro two\n\n" + FOOTER),
        (3, FOOTER + "\n\nunique body three"),
        (4, "all unique here\n\nand here too"),
        (5, FOOTER),          # footer-only doc -> everything dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_drops_planted_shared_paragraph(spark, para_corpus):
    got = {r["doc_id"]: r for r in dedup.paragraph_dedup(
        para_corpus, "doc_id", "text", min_count=2).collect()}
    assert got[1]["clean_text"] == "unique intro one\n\nunique body one"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 2)
    assert got[2]["clean_text"] == "unique intro two"
    assert got[3]["clean_text"] == "unique body three"
    # untouched doc round-trips byte-exact
    assert got[4]["clean_text"] == "all unique here\n\nand here too"
    assert got[4]["n_kept"] == 2
    # a doc that was ALL boilerplate stays present with empty text
    assert got[5]["clean_text"] == "" and got[5]["n_kept"] == 0


def test_paragraph_dedup_respects_count_floor(spark, para_corpus):
    # floor of 5: the footer appears only 4 times -> nothing dropped
    got = {r["doc_id"]: r["n_kept"] for r in dedup.paragraph_dedup(
        para_corpus, "doc_id", "text", min_count=5).collect()}
    assert got == {1: 3, 2: 2, 3: 2, 4: 2, 5: 1}


def test_paragraph_incremental_equals_batch_on_union(spark, para_corpus):
    """maintain ≡ recompute: cleaning a new batch against the stored
    counts must equal the batch operator over stored ∪ new, restricted
    to the new ids."""
    stored_docs = para_corpus.filter("doc_id <= 3")
    new_docs = para_corpus.filter("doc_id > 3")
    stored = dedup.paragraph_hash_counts(stored_docs)
    inc = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
           for r in dedup.paragraph_dedup_incremental(
               new_docs, stored, min_count=2).collect()}
    full = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
            for r in dedup.paragraph_dedup(
                para_corpus, min_count=2).collect()
            if r["doc_id"] > 3}
    assert inc == full


def test_paragraph_hash_counts_merge_by_addition(spark, para_corpus):
    a = dedup.paragraph_hash_counts(para_corpus.filter("doc_id <= 2"))
    b = dedup.paragraph_hash_counts(para_corpus.filter("doc_id > 2"))
    from pyspark.sql import functions as F
    merged = {r["para_hash"]: r["n"] for r in
              a.unionByName(b).groupBy("para_hash")
              .agg(F.sum("n").alias("n")).collect()}
    whole = {r["para_hash"]: r["n"] for r in
             dedup.paragraph_hash_counts(para_corpus).collect()}
    assert merged == whole
