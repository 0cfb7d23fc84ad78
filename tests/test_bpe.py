"""Distributed BPE training vs the textbook algorithm (Sennrich et
al. 2016): the Spark merge table must EXACTLY equal a pure-Python
reference run on the same corpus, under hypothesis-generated corpora
with heavy repetition (ties exercised and broken identically)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from twitter_to_sqlite_spark.functions import bpe

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_bpe(texts: list[str], merges: int):
    """Executable spec: word-frequency dictionary, per-round pair
    count (overlaps count), argmax on (count desc, a, b), left-to-right
    non-overlapping merge."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"\W+", t.lower()):
            if w:
                words[w] += 1
    dic = {tuple(list(w) + [bpe.EOW]): f for w, f in words.items()}
    out = []
    for rank in range(1, merges + 1):
        pairs = Counter()
        for syms, f in dic.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        out.append((rank, a, b, cnt))
        new = {}
        for syms, f in dic.items():
            merged, pend = [], None
            for x in syms:
                if pend == a and x == b:
                    merged.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        merged.append(pend)
                    pend = x
            if pend is not None:
                merged.append(pend)
            key = tuple(merged)
            new[key] = new.get(key, 0) + f
        dic = new
    return out


WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    min_size=1, max_size=12,
)


@given(docs=st.lists(WORDS, min_size=1, max_size=5))
@SETTINGS
def test_bpe_train_matches_reference(spark, docs):
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe.bpe_train(df, merges=4).collect()]
    assert got == _ref_bpe(texts, 4)


def test_bpe_train_learns_the_planted_bigram(spark):
    # 'qu' dominates: every word contains it
    df = spark.createDataFrame(
        [("quick quack quiet quorum",), ("quilt quiz quota",)],
        "text string")
    got = bpe.bpe_train(df, merges=1).collect()[0]
    assert (got["left"], got["right"]) == ("q", "u")
    assert got["pair_count"] == 7


def test_bpe_segment_compresses_with_merges(spark):
    df = spark.createDataFrame(
        [(1, "banana bandana banana"), (2, "ban ban banana")],
        "doc_id long, text string")
    merges = [(r["rank"], r["left"], r["right"], r["pair_count"])
              for r in bpe.bpe_train(df, merges=6).collect()]
    seg0 = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe.bpe_segment(df, []).collect()}
    seg6 = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe.bpe_segment(df, merges).collect()}
    for d in seg0:
        assert seg6[d] < seg0[d]
    # zero merges = chars + end marker
    assert seg0[1] == len("banana") + 1 + len("bandana") + 1 + len("banana") + 1


def test_bpe_catalog_query_shape(spark, sf_dir):
    from twitter_to_sqlite_spark.plans import catalog

    rows = catalog.q_bpe_train(spark, sf_dir).collect()
    assert len(rows) == catalog._BPE_MERGES
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, catalog._BPE_MERGES + 1))
    # counts are non-increasing-ish only per round's own corpus state;
    # but every count is positive and every merged symbol is novel
    seen = set()
    for r in rows:
        assert r["pair_count"] > 0
        assert (r["left"], r["right"]) not in seen
        seen.add((r["left"], r["right"]))


def _ref_segment(texts: list[str], merge_rows) -> dict[int, int]:
    """Executable spec of bpe_segment: apply the merges in rank order
    to every word, count final symbols per document."""
    import re

    def fold(syms, a, b):
        merged, pend = [], None
        for x in syms:
            if pend == a and x == b:
                merged.append(a + b)
                pend = None
            else:
                if pend is not None:
                    merged.append(pend)
                pend = x
        if pend is not None:
            merged.append(pend)
        return merged

    out = {}
    for i, t in enumerate(texts):
        n = 0
        any_word = False
        for w in re.split(r"\W+", t.lower()):
            if not w:
                continue
            any_word = True
            syms = list(w) + [bpe.EOW]
            for _rank, a, b, _cnt in merge_rows:
                syms = fold(syms, a, b)
            n += len(syms)
        if any_word:
            out[i] = n
    return out


@given(docs=st.lists(WORDS, min_size=1, max_size=5))
@SETTINGS
def test_bpe_segment_matches_reference_after_training(spark, docs):
    """Law (VERDICT r5 task 4): segment(train(corpus)) per-doc token
    counts equal the textbook greedy-merge result on the same corpus."""
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = _ref_bpe(texts, 4)
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe.bpe_segment(df, merges).collect()}
    assert got == _ref_segment(texts, merges)
