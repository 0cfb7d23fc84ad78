"""Unit tests for the cleaning/curation operators (pii_scrub,
repetition_stats, lm_bigram_score, hash/stratified sampling) on
crafted rows where the right answer is known by hand. The sf0.001
oracle parity for the catalog versions lives in test_oracle_parity.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import sampling, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPiiScrub:
    def test_redacts_all_three_kinds(self, spark):
        d = _docs(spark, [
            (1, "mail bob.smith+x@sub.example.co.uk now"),
            (2, "server at 10.0.255.3 down"),
            (3, "call +44 20 7946-0958 today"),
            (4, "clean text, nothing here"),
        ])
        got = {r["doc_id"]: r for r in text.pii_scrub(d).collect()}
        assert got[1]["text_clean"] == "mail [EMAIL] now"
        assert got[2]["text_clean"] == "server at [IP] down"
        assert got[3]["text_clean"] == "call [PHONE] today"
        assert got[4]["text_clean"] == "clean text, nothing here"
        assert [got[i]["n_pii"] for i in (1, 2, 3, 4)] == [1, 1, 1, 0]

    def test_multiple_hits_counted(self, spark):
        d = _docs(spark, [(1, "a@b.io c@d.io and 1.2.3.4 5.6.7.8")])
        row = text.pii_scrub(d).collect()[0]
        assert row["n_pii"] == 4
        assert row["text_clean"] == "[EMAIL] [EMAIL] and [IP] [IP]"

    def test_ip_not_double_redacted_as_phone(self, spark):
        # Phone pattern requires a leading +; bare dotted quads must
        # come out as [IP] exactly once.
        d = _docs(spark, [(1, "ping 192.168.0.12")])
        row = text.pii_scrub(d).collect()[0]
        assert row["text_clean"] == "ping [IP]"
        assert row["n_pii"] == 1


class TestRepetitionStats:
    def test_no_repetition(self, spark):
        d = _docs(spark, [(1, "alpha beta gamma delta")])
        row = text.repetition_stats(d).collect()[0]
        assert row["n_words"] == 4
        assert row["dup_word_frac"] == 0.0
        # 3 distinct bigrams, each once → top fraction 1/3
        assert row["top_bigram_frac"] == pytest.approx(0.3333, abs=1e-4)

    def test_fully_looped_text(self, spark):
        d = _docs(spark, [(1, "spam spam spam spam")])
        row = text.repetition_stats(d).collect()[0]
        assert row["dup_word_frac"] == 0.75     # 1 distinct of 4
        assert row["top_bigram_frac"] == 1.0    # 'spam spam' is all of them

    def test_short_doc_has_zero_bigram_frac(self, spark):
        d = _docs(spark, [(1, "word")])
        row = text.repetition_stats(d).collect()[0]
        assert row["n_words"] == 1
        assert row["top_bigram_frac"] == 0.0


class TestLmBigramScore:
    def test_common_transitions_score_higher(self, spark):
        # 'a b' appears 3×; prefix 'a' always continues to 'b'
        # → logP(a→b)=0. 'x y' and 'x z' split prefix 'x' → logP=-1.
        d = _docs(spark, [
            (1, "a b"), (2, "a b"), (3, "a b"),
            (4, "x y"), (5, "x z"),
        ])
        got = {r["doc_id"]: r["avg_logp"] for r in text.lm_bigram_score(d).collect()}
        assert got[1] == 0.0
        assert got[4] == -1.0 and got[5] == -1.0

    def test_mean_over_doc_bigrams(self, spark):
        # doc 1: bigrams 'a b' (logp 0) and 'b c' vs 'b d' (-1) → mean -0.5
        d = _docs(spark, [(1, "a b c"), (2, "b d")])
        got = {r["doc_id"]: r for r in text.lm_bigram_score(d).collect()}
        assert got[1]["n_bigrams"] == 2
        assert got[1]["avg_logp"] == pytest.approx(-0.5, abs=1e-4)


class TestSampling:
    def test_hash_sample_is_deterministic_and_proportional(self, spark):
        d = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = sorted(r["k"] for r in sampling.hash_sample(d, 4, "k").collect())
        b = sorted(r["k"] for r in sampling.hash_sample(d, 4, "k").collect())
        assert a == b                      # reproducible
        assert 350 < len(a) < 650          # ~1/4 of 2000
        salted = sorted(
            r["k"] for r in sampling.hash_sample(d, 4, "k", salt="s2").collect()
        )
        assert salted != a                 # salt decorrelates

    def test_stratified_rates(self, spark):
        d = spark.createDataFrame(
            [(i, "keep" if i % 2 == 0 else "thin") for i in range(2000)],
            "k long, s string",
        )
        out = sampling.stratified_sample(
            d, "s", {"keep": 1, "thin": 10}, key_col="k").collect()
        kept = [r for r in out if r["s"] == "keep"]
        thinned = [r for r in out if r["s"] == "thin"]
        assert len(kept) == 1000           # denominator 1 keeps all
        assert 40 < len(thinned) < 220     # ~1/10 of 1000

    def test_unlisted_stratum_uses_default(self, spark):
        d = spark.createDataFrame(
            [(i, "other") for i in range(1000)], "k long, s string")
        out = sampling.stratified_sample(
            d, "s", {"listed": 5}, key_col="k", default_denom=2).collect()
        assert 350 < len(out) < 650        # ~1/2

    def test_sample_filter_reaches_scan(self, spark, sf_dir):
        # The sample predicate must be a pushed filter over the scan —
        # no shuffle, no job structure beyond the read.
        from twitter_to_sqlite_spark import tables

        d = tables.load_table(spark, sf_dir, "documents")
        plan = sampling.hash_sample(d, 3, "doc_id")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestMinhashIndex:
    def test_probe_matches_cross_and_index_appends(self, spark, tmp_path):
        """probe_minhash_index == cross_minhash_pairs on the same
        corpus; appending an accepted shard's bands keeps the store
        current without re-sketching it."""
        from pyspark.sql import functions as F

        from twitter_to_sqlite_spark.functions import dedup

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon zeta doc {i}")
             for i in range(20)],
            "doc_id long, text string",
        )
        stored = docs.filter(F.col("doc_id") < 10)
        # shard A: near-copies of stored docs 0-4
        shard_a = stored.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 100).alias("doc_id"),
            F.concat("text", F.lit(" zzz")).alias("text"),
        )
        path = str(tmp_path / "idx")
        dedup.build_minhash_index(stored, path)
        via_index = sorted(map(tuple,
            dedup.probe_minhash_index(spark, path, shard_a).collect()))
        via_cross = sorted(map(tuple,
            dedup.cross_minhash_pairs(shard_a, stored).collect()))
        assert via_index == via_cross and len(via_index) >= 5

        # accept shard A: append its bands; shard B (copy of doc 100)
        # must now collide with A through the store
        dedup.append_minhash_index(shard_a, path)
        shard_b = shard_a.filter(F.col("doc_id") == 100).select(
            (F.col("doc_id") + 100).alias("doc_id"), "text")
        hits = dedup.probe_minhash_index(spark, path, shard_b).collect()
        assert any(r["id_a"] == 100 for r in hits)  # found the accepted shard


class TestTrainingShards:
    def test_shard_membership_is_deterministic(self, spark, tmp_path):
        from twitter_to_sqlite_spark.functions.sampling import (
            write_training_shards,
        )

        d = spark.createDataFrame(
            [(i, f"doc {i}", i % 7) for i in range(500)],
            "doc_id long, text string, quality long",
        )
        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        write_training_shards(d, p1, 8, "doc_id", order_col="quality")
        write_training_shards(d, p2, 8, "doc_id", order_col="quality")

        def membership(p):
            rows = spark.read.parquet(p).select("shard", "doc_id").collect()
            m: dict = {}
            for r in rows:
                m.setdefault(r["shard"], set()).add(r["doc_id"])
            return m

        m1, m2 = membership(p1), membership(p2)
        assert m1 == m2                          # reproducible split
        assert len(m1) == 8                      # every shard non-empty
        assert sum(len(v) for v in m1.values()) == 500  # partition, no loss
        sizes = sorted(len(v) for v in m1.values())
        assert sizes[0] > 20                     # roughly balanced


class TestDuplicateSpans:
    def test_cross_doc_shared_run_becomes_one_span_each(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "one two three four five six seven eight"),
            (2, "zz one two three four five qq rr ss tt"),
        ])
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_tokens"])
            for r in dedup.duplicate_spans(d, window=4).collect()
        )
        # shared run "one two three four five" (5 tokens): dup 4-gram
        # windows at doc1 pos {0,1} and doc2 pos {1,2}, merged.
        assert got == [(1, 0, 5, 5), (2, 1, 6, 5)]

    def test_within_doc_repetition_merges_to_one_span(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [(1, "p q r s p q r s p q r s")])
        got = [(r["span_start"], r["span_end"])
               for r in dedup.duplicate_spans(d, window=4).collect()]
        assert got == [(0, 12)]

    def test_far_apart_regions_stay_separate_spans(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        shared_a = "a b c d"
        shared_b = "w x y z"
        d = _docs(spark, [
            (1, f"{shared_a} g1 g2 g3 g4 g5 g6 g7 g8 g9 {shared_b}"),
            (2, f"{shared_a} h1 h2 h3 h4 h5 h6 h7 h8 h9 {shared_b}"),
        ])
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dedup.duplicate_spans(d, window=4).collect()
        )
        assert got == [(1, 0, 4), (1, 13, 17), (2, 0, 4), (2, 13, 17)]

    def test_no_duplicates_yields_empty(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
        ])
        assert dedup.duplicate_spans(d, window=4).count() == 0


class TestDuplicateSpansKeepFirst:
    def test_canonical_doc_keeps_its_copy(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "one two three four five six seven eight"),
            (2, "zz one two three four five qq rr ss tt"),
        ])
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dedup.duplicate_spans_keep_first(d, window=4)
            .collect()
        )
        # doc 1 holds the canonical (min doc_id) occurrences of both
        # dup 4-grams; only doc 2's copy is marked.
        assert got == [(2, 1, 6)]

    def test_identical_docs_remove_all_but_lowest_id(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        t = "a b c d e f"
        d = _docs(spark, [(3, t), (1, t), (2, t)])
        spans = dedup.duplicate_spans_keep_first(d, window=4)
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in spans.collect()
        )
        assert got == [(2, 0, 6), (3, 0, 6)]
        cleaned = {r["doc_id"]: r["text_clean"]
                   for r in dedup.remove_spans(d, spans).collect()}
        assert cleaned == {1: t, 2: "", 3: ""}

    def test_within_doc_repeat_keeps_first_occurrence(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        # "p q r s" repeats at pos 0/4/8 within ONE doc. The 4 distinct
        # rotation hashes have canonical positions 0-3, so marked
        # window positions are 4-8, merging to the single span [4, 12)
        # — the first full period [0, 4) survives removal.
        d = _docs(spark, [(1, "p q r s p q r s p q r s")])
        got = [(r["span_start"], r["span_end"])
               for r in dedup.duplicate_spans_keep_first(d, window=4)
               .collect()]
        assert got == [(4, 12)]

    def test_no_duplicates_yields_empty(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
        ])
        assert dedup.duplicate_spans_keep_first(d, window=4).count() == 0

    def test_marked_positions_subset_of_aggressive(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "one two three four five six seven eight"),
            (2, "zz one two three four five qq rr ss tt"),
            (3, "p q r s p q r s one two three four xx"),
            (4, "unique tokens only here nothing shared at all"),
        ])

        def positions(spans):
            return {(r["doc_id"], p)
                    for r in spans.collect()
                    for p in range(r["span_start"], r["span_end"])}

        keep_first = positions(
            dedup.duplicate_spans_keep_first(d, window=4))
        aggressive = positions(dedup.duplicate_spans(d, window=4))
        assert keep_first < aggressive  # strictly: canonicals survive

    def test_injected_shingles_match_self_computed(self, spark):
        """The shared base-corpus shingle frame must reproduce every
        consumer's self-computed rows exactly (the r10 sharing):
        shingling is per-document, so a disjoint-id union's shingles
        are the union of its parts' shingles, and id filters commute
        with it."""
        from pyspark.sql import functions as F
        from twitter_to_sqlite_spark.functions import dedup

        base = _docs(spark, [
            (1, "one two three four five six seven"),
            (2, "zz one two three four five qq rr"),
            (3, "p q r s p q r s one two three"),
            (4, "alpha beta gamma delta epsilon zeta"),
        ])
        planted = _docs(spark, [
            (1_000_001, "one two three four five six seven zzz"),
        ])
        union = base.unionByName(planted)
        sh = dedup.shingles(base, "doc_id", "text", 3).unionByName(
            dedup.shingles(planted, "doc_id", "text", 3))

        def same(a, b, name):
            assert a.exceptAll(b).count() == 0, name
            assert b.exceptAll(a).count() == 0, name

        same(dedup.ngram_jaccard_pairs(union, k=3, threshold=0.1,
                                       max_df=3, shingles_df=sh),
             dedup.ngram_jaccard_pairs(union, k=3, threshold=0.1,
                                       max_df=3), "jaccard")
        same(dedup.containment_pairs(union, k=3, threshold=0.1,
                                     max_df=3, shingles_df=sh),
             dedup.containment_pairs(union, k=3, threshold=0.1,
                                     max_df=3), "containment")
        same(dedup.dup_ngram_stats(union, k=3, shingles_df=sh),
             dedup.dup_ngram_stats(union, k=3), "dup_ngram")
        # novelty: id filters + verbatim-copy remap off one base frame
        base_sh = dedup.shingles(base, "doc_id", "text", 3)
        new = base.filter(F.col("doc_id") % 2 == 1)
        stored = base.filter(F.col("doc_id") % 2 == 0)
        same(dedup.novelty_stats(
                 new, stored, k=3,
                 new_shingles=base_sh.filter(F.col("id") % 2 == 1),
                 stored_shingles=base_sh.filter(F.col("id") % 2 == 0)),
             dedup.novelty_stats(new, stored, k=3), "novelty")

    def test_injected_positions_match_self_computed(self, spark):
        """The shared duplicate_positions front must reproduce BOTH
        policies' self-computed span rows exactly (the r10 sharing —
        one hash-window pass, two filters)."""
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "one two three four five six seven eight"),
            (2, "zz one two three four five qq rr ss tt"),
            (3, "p q r s p q r s one two three four xx"),
            (4, "unique tokens only here nothing shared at all"),
        ])
        pos = dedup.duplicate_positions(d, window=4)
        for fn in (dedup.duplicate_spans, dedup.duplicate_spans_keep_first):
            plain = fn(d, window=4)
            shared = fn(d, window=4, positions=pos)
            assert plain.exceptAll(shared).count() == 0, fn.__name__
            assert shared.exceptAll(plain).count() == 0, fn.__name__


class TestMixCorpora:
    def _mix_input(self, spark):
        rows = [
            # source A: three 10-token docs (T=30)
            (1, "A", 10), (2, "A", 10), (3, "A", 10),
            # source B: two 10-token docs (T=20)
            (4, "B", 10), (5, "B", 10),
            # source C: excluded (no weight)
            (6, "C", 10),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long")

    def test_budgets_follow_weights_exactly(self, spark):
        d = self._mix_input(spark)
        got = sampling.mix_corpora(
            d, "source", {"A": 0.6, "B": 0.2},
            key_col="doc_id", token_col="n_tokens").collect()
        # scale = min(30/0.6, 20/0.2) = 50 → budget A=30 (keeps all 3),
        # B=10 (keeps exactly its hash-first doc); C excluded.
        by_src = {}
        for r in got:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["A"]) == 3
        assert len(by_src["B"]) == 1
        assert "C" not in by_src
        assert by_src["A"][0]["budget"] == pytest.approx(30.0)
        assert by_src["B"][0]["budget"] == pytest.approx(10.0)

    def test_deterministic_across_runs(self, spark):
        d = self._mix_input(spark)
        kw = dict(key_col="doc_id", token_col="n_tokens")
        a = {r["doc_id"] for r in sampling.mix_corpora(
            d, "source", {"A": 0.6, "B": 0.2}, **kw).collect()}
        b = {r["doc_id"] for r in sampling.mix_corpora(
            d.repartition(7), "source", {"A": 0.6, "B": 0.2}, **kw).collect()}
        assert a == b


class TestGopherFilter:
    def test_good_doc_keeps(self, spark):
        d = _docs(spark, [(1, "the quick brown fox jumps over a lazy dog "
                              "and then runs far into the quiet green woods")])
        row = text.gopher_filter(d).collect()[0]
        assert row["keep"] is True
        assert row["n_words"] >= 15 and row["n_stop_hits"] >= 2

    def test_short_doc_fails_word_count(self, spark):
        d = _docs(spark, [(1, "the cat sat on a mat")])
        row = text.gopher_filter(d).collect()[0]
        assert row["pass_words"] is False and row["keep"] is False
        assert row["pass_stopwords"] is True

    def test_numeric_doc_fails_alpha(self, spark):
        words = " ".join(str(n) * 3 for n in range(20))
        d = _docs(spark, [(1, words)])
        row = text.gopher_filter(d).collect()[0]
        assert row["alpha_frac"] == 0.0 and row["pass_alpha"] is False

    def test_long_words_fail_mean_length(self, spark):
        d = _docs(spark, [(1, " ".join("supercalifragilistic" + str(i)
                                       for i in range(20)))])
        row = text.gopher_filter(d).collect()[0]
        assert row["pass_word_len"] is False and row["keep"] is False

    def test_symbol_heavy_doc_fails(self, spark):
        base = ("the and for with that this from have more some "
                "when each which their about")
        d = _docs(spark, [(1, base + " ###### ######")])
        row = text.gopher_filter(d).collect()[0]
        assert row["symbol_ratio"] > 0.1 and row["pass_symbols"] is False


class TestAssignSplits:
    def test_partition_of_corpus_and_stability(self, spark):
        d = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        got = sampling.assign_splits(
            d, {"train": 8, "val": 1, "test": 1}, key_col="doc_id")
        rows = got.collect()
        by_split = {}
        for r in rows:
            by_split.setdefault(r["split"], set()).add(r["doc_id"])
        # every row assigned exactly one split; rough proportions hold
        assert sum(len(v) for v in by_split.values()) == 1000
        assert set(by_split) == {"train", "val", "test"}
        assert len(by_split["train"]) > 700
        # growing the corpus never moves an existing row's split
        bigger = sampling.assign_splits(
            spark.range(0, 2000).withColumnRenamed("id", "doc_id"),
            {"train": 8, "val": 1, "test": 1}, key_col="doc_id")
        sub = {r["doc_id"]: r["split"] for r in bigger.collect()
               if r["doc_id"] < 1000}
        assert sub == {r["doc_id"]: r["split"] for r in rows}

    def test_salt_decorrelates(self, spark):
        d = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in sampling.assign_splits(
            d, {"train": 1, "test": 1}, key_col="doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in sampling.assign_splits(
            d, {"train": 1, "test": 1}, key_col="doc_id",
            salt="v2").collect()}
        moved = sum(1 for k in a if a[k] != b[k])
        assert 300 < moved < 700  # ~half move under an independent salt


class TestRemoveSpans:
    def _spans(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, span_start long, span_end long")

    def test_cuts_covered_tokens(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [(1, "a b c d e f g h")])
        sp = self._spans(spark, [(1, 2, 5)])
        row = dedup.remove_spans(d, sp).collect()[0]
        assert row["text_clean"] == "a b f g h"
        assert row["n_removed_tokens"] == 3

    def test_no_spans_passthrough(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [(1, "alpha beta gamma")])
        sp = self._spans(spark, [])
        row = dedup.remove_spans(d, sp).collect()[0]
        assert row["text_clean"] == "alpha beta gamma"
        assert row["n_removed_tokens"] == 0

    def test_full_coverage_yields_empty_text(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [(1, "x y z")])
        sp = self._spans(spark, [(1, 0, 3)])
        row = dedup.remove_spans(d, sp).collect()[0]
        assert row["text_clean"] == "" and row["n_removed_tokens"] == 3

    def test_overlapping_spans_count_once(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [(1, "a b c d e f")])
        sp = self._spans(spark, [(1, 0, 3), (1, 2, 4)])
        row = dedup.remove_spans(d, sp).collect()[0]
        assert row["text_clean"] == "e f"
        assert row["n_removed_tokens"] == 4

    def test_detect_then_remove_composition(self, spark):
        from twitter_to_sqlite_spark.functions import dedup

        d = _docs(spark, [
            (1, "one two three four five six seven eight"),
            (2, "zz one two three four five qq rr ss tt"),
        ])
        spans = dedup.duplicate_spans(d, window=4)
        got = {r["doc_id"]: r for r in dedup.remove_spans(d, spans).collect()}
        assert got[1]["text_clean"] == "six seven eight"
        assert got[2]["text_clean"] == "zz qq rr ss tt"


class TestTfidfTopTerms:
    def test_rare_term_outscores_common(self, spark):
        # 'zebra' appears once in one doc; 'the' in every doc — idf of
        # a universal term is ln(1)=0, so it can never rank.
        d = spark.createDataFrame(
            [(1, "en", "the zebra"), (2, "en", "the cat"),
             (3, "fr", "the chat")],
            "doc_id long, lang string, text string")
        got = text.tfidf_top_terms(d, group_col="lang", k=2).collect()
        en = [r["term"] for r in got if r["lang"] == "en"]
        assert set(en) <= {"zebra", "cat"}  # 'the' scored 0, excluded by k
        the = [r for r in got if r["term"] == "the"]
        assert all(r["score"] == 0.0 for r in the)

    def test_rank_bounded_and_dense(self, spark):
        d = spark.createDataFrame(
            [(i, "en", f"w{i} w{i} shared") for i in range(6)],
            "doc_id long, lang string, text string")
        got = text.tfidf_top_terms(d, group_col="lang", k=3).collect()
        assert sorted(r["rank"] for r in got) == [1, 2, 3]


class TestPerplexityBuckets:
    def test_buckets_balanced_within_one(self, spark):
        rows = [(i, "en", f"a b c d{i % 4} e") for i in range(12)]
        d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = text.perplexity_buckets(d, group_col="lang", n_buckets=3).collect()
        from collections import Counter
        c = Counter(r["bucket"] for r in got)
        assert set(c) == {1, 2, 3}
        assert max(c.values()) - min(c.values()) <= 1
        names = {r["bucket"]: r["bucket_name"] for r in got}
        assert names == {1: "head", 2: "middle", 3: "tail"}

    def test_head_scores_at_least_tail(self, spark):
        rows = [(i, "en", "x y " * 5 + f"rare{i}" * (i % 3)) for i in range(9)]
        d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = text.perplexity_buckets(d, group_col="lang", n_buckets=3).collect()
        head = min(r["avg_logp"] for r in got if r["bucket"] == 1)
        tail = max(r["avg_logp"] for r in got if r["bucket"] == 3)
        assert head >= tail


class TestTemperatureMixture:
    def _mk(self, spark):
        return spark.createDataFrame(
            [(1, "en", 900), (2, "fr", 90), (3, "de", 10)],
            "doc_id long, lang string, n_tokens long")

    def test_shares_sum_to_one_and_alpha_lifts_small(self, spark):
        out = {r["lang"]: r for r in sampling.temperature_mixture(
            self._mk(spark), "lang", "n_tokens", alpha=0.3).collect()}
        assert abs(sum(r["p_raw"] for r in out.values()) - 1.0) < 1e-4
        assert abs(sum(r["p_smoothed"] for r in out.values()) - 1.0) < 1e-4
        assert out["de"]["upsample"] > 1.0 > out["en"]["upsample"]

    def test_alpha_one_is_proportional(self, spark):
        out = sampling.temperature_mixture(
            self._mk(spark), "lang", "n_tokens", alpha=1.0).collect()
        for r in out:
            assert r["p_raw"] == r["p_smoothed"]
            assert r["upsample"] == 1.0

    def test_alpha_zero_is_uniform(self, spark):
        out = sampling.temperature_mixture(
            self._mk(spark), "lang", "n_tokens", alpha=0.0).collect()
        for r in out:
            assert abs(r["p_smoothed"] - 1.0 / 3.0) < 1e-4


class TestQualityClassifier:
    def _feats(self, spark):
        from twitter_to_sqlite_spark.functions import classifier
        rows = (
            [(i, ("the quick brown fox jumps over a lazy dog near the river "
                  "and it runs for miles " + f"tail{i}")) for i in range(20)]
            + [(100 + i, f"spam spam spam spam spam {i}") for i in range(20)]
        )
        d = spark.createDataFrame(rows, "doc_id long, text string")
        return classifier.quality_features(d)

    def test_labels_separate_good_from_spam(self, spark):
        got = {r["doc_id"]: r["y"] for r in self._feats(spark).collect()}
        assert all(got[i] == 1 for i in range(20))
        assert all(got[100 + i] == 0 for i in range(20))

    def test_training_learns_and_is_deterministic(self, spark):
        from twitter_to_sqlite_spark.functions import classifier
        feats = self._feats(spark)
        w1 = classifier.logreg_train(feats, iters=16, lr=8.0)
        w2 = classifier.logreg_train(feats, iters=16, lr=8.0)
        assert w1 == w2  # rounded trajectory → bit-identical weights
        scored = classifier.logreg_score(feats, w1).collect()
        acc = sum(1 for r in scored if (r["prob"] > 0.5) == (r["y"] == 1))
        assert acc / len(scored) >= 0.9  # beats the 0.5 majority baseline
        good = [r["prob"] for r in scored if r["y"] == 1]
        spam = [r["prob"] for r in scored if r["y"] == 0]
        assert min(good) > max(spam)

    def test_scoring_is_narrow(self, spark):
        from twitter_to_sqlite_spark.functions import classifier
        feats = self._feats(spark)
        w = [0.1, 0.2, 0.3, 0.4, 0.5]
        plan = classifier.logreg_score(feats, w)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # pure per-row projection


class TestCuratePipeline:
    def _docs(self, spark):
        good = ("the quick brown fox jumps over a lazy dog and then it "
                "runs on for a while longer with many varied words here")
        rows = (
            [(i, good + f" uniq{i}", "en") for i in range(10)]
            + [(100, good + " uniq3", "en")]       # exact dup of doc 3... no:
            + [(101, "spam spam spam spam", "en")]  # fails gopher
            + [(102, "mail me at a@b.io " + good, "en")]  # has PII
        )
        # make 100 a TRUE exact duplicate of 3 (after scrub, identical)
        rows[10] = (100, good + " uniq3", "en")
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_flags_and_funnel(self, spark):
        from twitter_to_sqlite_spark.functions import curate
        flagged = curate.curate_flags(self._docs(spark))
        got = {r["doc_id"]: r for r in flagged.collect()}
        assert not got[101]["pass_gopher"]          # spam gated out
        assert got[0]["pass_gopher"] and got[0]["keep"]
        assert got[3]["pass_dedup"] and not got[100]["pass_dedup"]  # min id wins
        assert "[EMAIL]" in got[102]["text_clean"]
        assert all(r["split"] in ("train", "val", "test") for r in got.values())
        stats = curate.curate_stats(flagged)
        assert stats["n_in"] == 13
        assert stats["n_keep"] == stats["n_in"] - 2  # spam + dup
        assert stats["n_pii_redactions"] == 1

    def test_funnel_is_one_aggregation(self, spark):
        from twitter_to_sqlite_spark.functions import curate
        flagged = curate.curate_flags(self._docs(spark))
        agg = flagged.agg(F.count(F.lit(1)))
        # one plan, no per-stage count jobs: stats collected via single agg
        import unittest.mock as mock
        calls = []
        orig = type(agg).collect
        with mock.patch.object(type(agg), "collect",
                               autospec=True,
                               side_effect=lambda self: calls.append(1) or orig(self)):
            curate.curate_stats(flagged)
        assert len(calls) == 1

    def test_run_curate_cli_end_to_end(self, spark, tmp_path):
        from twitter_to_sqlite_spark import cli
        src = str(tmp_path / "docs")
        self._docs(spark).write.parquet(src)
        out = str(tmp_path / "out")
        rc = cli.main(["curate", src, out, "--shards", "2"])
        assert rc == 0
        curated = spark.read.parquet(f"{out}/curated")
        assert "split" in curated.columns
        assert curated.count() == 11
        assert curated.filter("doc_id = 101").count() == 0
        shards = spark.read.parquet(f"{out}/train_shards")
        n_train = curated.filter("split = 'train'").count()
        assert shards.count() == n_train
        assert shards.select("shard").distinct().count() <= 2


class TestGroupedNtileDist:
    def test_matches_window_ntile_exactly(self, spark):
        """Distributed grouped ntile must reproduce the window ntile
        bit-for-bit on adversarial inputs: skewed groups, heavy ties,
        groups smaller than the bucket count."""
        from pyspark.sql import Window
        from twitter_to_sqlite_spark.operators import relational as R
        rows = (
            [(i, "big", float(i % 7)) for i in range(500)]      # ties
            + [(1000 + i, "small", float(i)) for i in range(2)]  # n < b
            + [(2000 + i, "mid", 1.0) for i in range(10)]        # all tied
        )
        d = spark.createDataFrame(rows, "id long, g string, v double")
        got = {
            r["id"]: r["bucket"]
            for r in R.grouped_ntile_dist(d, "g", "v", "id", 3).collect()
        }
        w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
        want = {
            r["id"]: r["nt"]
            for r in d.withColumn("nt", F.ntile(3).over(w)).collect()
        }
        assert got == want


class TestGroupedCumsumDist:
    def test_matches_window_cumsum_exactly(self, spark):
        from pyspark.sql import Window
        from twitter_to_sqlite_spark.operators import relational as R
        rows = (
            [(i, "big", float(i % 5), (i * 7) % 13 + 1) for i in range(400)]
            + [(1000, "one", 0.0, 5)]
        )
        d = spark.createDataFrame(rows, "id long, g string, v double, tok long")
        got = {
            r["id"]: r["cum"]
            for r in R.grouped_cumsum_dist(d, "g", "v", "id", "tok").collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy(F.col("v").asc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["id"]: r["cs"]
            for r in d.withColumn("cs", F.sum("tok").over(w)).collect()
        }
        assert got == want


class TestImportanceSample:
    def test_rate_tracks_probability_and_is_deterministic(self, spark):
        d = spark.createDataFrame(
            [(i, 0.9 if i < 500 else 0.1) for i in range(1000)],
            "doc_id long, p double")
        got1 = {r["doc_id"] for r in
                sampling.importance_sample(d, "p", "doc_id").collect()}
        got2 = {r["doc_id"] for r in
                sampling.importance_sample(d, "p", "doc_id").collect()}
        assert got1 == got2  # hash draw: reproducible
        hi = sum(1 for i in got1 if i < 500) / 500
        lo = sum(1 for i in got1 if i >= 500) / 500
        assert 0.8 < hi <= 1.0 and 0.0 <= lo < 0.2
        # independent draw under a different salt
        got3 = {r["doc_id"] for r in
                sampling.importance_sample(d, "p", "doc_id", salt="b").collect()}
        assert got3 != got1


# ------------------------------------ r5 composition semantic checks

def test_winsorize_caps_bound_output(spark, sf_dir):
    """Winsorized values never exceed the per-type cap, the cap is an
    actual data value, and clipped rows are exactly those above it."""
    from twitter_to_sqlite_spark.plans import catalog

    out = catalog.QUERIES["winsorize"](spark, sf_dir)
    rows = out.collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for ty, rs in by_type.items():
        cap = max(r.value_winsorized for r in rs)
        for r in rs:
            assert r.value_winsorized <= cap + 1e-9
            assert r.was_clipped == (r.value > r.value_winsorized)


def test_equidepth_bins_are_balanced(spark, sf_dir):
    """Quartile edges from the sample produce four bins whose counts
    are within a reasonable band of n/4 (sampling error + ties), and
    bin ranges are disjoint and ordered."""
    from twitter_to_sqlite_spark.plans import catalog

    rows = sorted(
        catalog.QUERIES["equidepth_histogram"](spark, sf_dir).collect(),
        key=lambda r: r.bin)
    assert [r.bin for r in rows] == [0, 1, 2, 3]
    total = sum(r.n_rows for r in rows)
    for r in rows:
        assert 0.10 * total <= r.n_rows <= 0.45 * total
    for a, b in zip(rows, rows[1:]):
        assert a.bin_max <= b.bin_min


def test_split_leakage_detects_planted_cross_split_dups(spark, sf_dir):
    """The planted near-copies land in hash-assigned splits, so with a
    10%-val split at least one pair must cross a boundary at sf0.001's
    planted-pair count — the audit's reason to exist."""
    from twitter_to_sqlite_spark.plans import catalog

    rows = catalog.QUERIES["split_leakage"](spark, sf_dir).collect()
    assert rows
    assert all(r.n_pairs > 0 for r in rows)
    assert any(not r.is_leak for r in rows)  # same-split pairs exist


# ---------------------------------------------------------------------
# containment (doc-in-doc) pairs
# ---------------------------------------------------------------------

def test_containment_finds_excerpt_jaccard_misses(spark):
    from twitter_to_sqlite_spark.functions import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    excerpt = " ".join(base.split()[:8])  # 40% prefix
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, other)], "doc_id long, text string")

    cont = dedup.containment_pairs(df, threshold=0.9).collect()
    assert [(r["contained_id"], r["container_id"]) for r in cont] == [(2, 1)]
    assert cont[0]["containment"] == 1.0

    jac = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert all((r["id_a"], r["id_b"]) != (1, 2) for r in jac)


def test_containment_equal_size_reports_lesser_id(spark):
    from twitter_to_sqlite_spark.functions import dedup

    t = "red orange yellow green blue indigo violet"
    df = spark.createDataFrame([(7, t), (4, t)], "doc_id long, text string")
    got = dedup.containment_pairs(df, threshold=0.9).collect()
    assert len(got) == 1
    assert (got[0]["contained_id"], got[0]["container_id"]) == (4, 7)


def test_containment_threshold_filters(spark):
    from twitter_to_sqlite_spark.functions import dedup

    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    half = "w1 w2 w3 w4 w5 x1 x2 x3 x4 x5"  # ~half the shingles differ
    df = spark.createDataFrame([(1, a), (2, half)], "doc_id long, text string")
    assert dedup.containment_pairs(df, threshold=0.9).collect() == []
    low = dedup.containment_pairs(df, threshold=0.3).collect()
    assert len(low) == 1


class TestTrainingOrder:
    """training_order (r6): the reproducible global shuffle."""

    def _base(self, spark, n=97, parts=4):
        return spark.range(n).select(
            F.col("id").alias("doc_id")).repartition(parts)

    def test_positions_are_dense_per_shard(self, spark):
        got = sampling.training_order(self._base(spark), "doc_id", 4).collect()
        assert len(got) == 97
        by_shard: dict = {}
        for r in got:
            by_shard.setdefault(r["shard"], []).append(r["position"])
        for shard, pos in by_shard.items():
            assert sorted(pos) == list(range(len(pos))), shard
        # shard assignment matches the manifest hash
        from twitter_to_sqlite_spark.functions.sampling import _key_hash
        want = {r["doc_id"]: r["s"] for r in self._base(spark).select(
            "doc_id", (_key_hash(F.col("doc_id")) % 4).cast("int").alias("s")
        ).collect()}
        for r in got:
            assert r["shard"] == want[r["doc_id"]]

    def test_order_is_partition_count_invariant(self, spark):
        """The law VERDICT r5 task 6 asks for: (shard, position) is a
        pure function of the data, never of the physical layout."""
        a = {r["doc_id"]: (r["shard"], r["position"])
             for r in sampling.training_order(
                 self._base(spark, parts=1), "doc_id", 4).collect()}
        b = {r["doc_id"]: (r["shard"], r["position"])
             for r in sampling.training_order(
                 self._base(spark, parts=13), "doc_id", 4).collect()}
        assert a == b

    def test_carry_columns_ride_through_unchanged(self, spark):
        """carry= must add the named columns to the output without
        perturbing (shard, position) — it replaces the join-back
        pattern, so it must be row-identical to it."""
        base = self._base(spark).withColumn(
            "n_kept", (F.col("doc_id") * 7 % 13).cast("long"))
        plain = sampling.training_order(
            base.select("doc_id"), "doc_id", 4)
        joined = {tuple(r) for r in plain.join(
            base, "doc_id").select(
            "doc_id", "shard", "position", "n_kept").collect()}
        carried = {tuple(r) for r in sampling.training_order(
            base, "doc_id", 4, carry=["n_kept"]).collect()}
        assert carried == joined

    def test_order_salt_decorrelates(self, spark):
        base = self._base(spark)
        a = {r["doc_id"]: r["position"] for r in sampling.training_order(
            base, "doc_id", 1, order_salt="ord").collect()}
        b = {r["doc_id"]: r["position"] for r in sampling.training_order(
            base, "doc_id", 1, order_salt="epoch2").collect()}
        assert a != b                      # a different epoch order
        assert sorted(a.values()) == sorted(b.values())


class TestSequencePack:
    """sequence_pack (r6): concat-and-chunk packing over the
    deterministic training order."""

    def _base(self, spark, n=60, parts=5):
        # token counts 1..7, deterministic per key
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7 + 1).cast("long").alias("n_toks"),
        ).repartition(parts)

    def test_stream_tiles_exactly(self, spark):
        got = sampling.sequence_pack(
            self._base(spark), "doc_id", "n_toks", 3, 16).collect()
        by_shard: dict = {}
        for r in got:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, rows in by_shard.items():
            # reconstruct the stream: sort by global token offset
            rows.sort(key=lambda r: (r["start_seq"] * 16
                                     + r["offset_in_seq"]))
            pos = 0
            for r in rows:
                off = r["start_seq"] * 16 + r["offset_in_seq"]
                assert off == pos, (shard, r)
                assert r["end_seq"] == (pos + r["n_tokens"] - 1) // 16
                pos += r["n_tokens"]

    def test_partition_count_invariant(self, spark):
        a = {r["doc_id"]: (r["shard"], r["start_seq"], r["offset_in_seq"])
             for r in sampling.sequence_pack(
                 self._base(spark, parts=1), "doc_id", "n_toks",
                 3, 16).collect()}
        b = {r["doc_id"]: (r["shard"], r["start_seq"], r["offset_in_seq"])
             for r in sampling.sequence_pack(
                 self._base(spark, parts=11), "doc_id", "n_toks",
                 3, 16).collect()}
        assert a == b

    def test_zero_token_docs_are_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, 3)], "doc_id long, n_toks long")
        got = sampling.sequence_pack(df, "doc_id", "n_toks", 1, 4)
        ids = [r["doc_id"] for r in got.collect()]
        assert 2 not in ids and sorted(ids) == [1, 3]


class TestSplitDedupSafe:
    """split_dedup_safe (r6): near-dup clusters never straddle splits."""

    def test_no_cross_split_pairs(self, spark, sf_dir):
        from twitter_to_sqlite_spark.plans import catalog

        split = {r["doc_id"]: r["split"]
                 for r in catalog.q_split_dedup_safe(spark, sf_dir).collect()}
        pairs = catalog._minhash_pairs(spark, sf_dir).collect()
        assert pairs, "planted dups must produce pairs"
        for p in pairs:
            assert split[p["id_a"]] == split[p["id_b"]], p

    def test_split_is_component_constant_and_covers_all_docs(
            self, spark, sf_dir):
        from twitter_to_sqlite_spark.plans import catalog

        rows = catalog.q_split_dedup_safe(spark, sf_dir).collect()
        n_docs = catalog._docs_with_planted_dups(spark, sf_dir).count()
        assert len(rows) == n_docs
        by_group: dict = {}
        for r in rows:
            by_group.setdefault(r["group_key"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_group.values())


class TestCurriculumOrder:
    """curriculum_order (r6): staged difficulty, shuffled within stage."""

    def _base(self, spark, n=80, parts=6):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("int").alias("bucket"),
        ).repartition(parts)

    def test_buckets_are_contiguous_and_positions_dense(self, spark):
        got = sampling.curriculum_order(
            self._base(spark), "doc_id", "bucket", 3).collect()
        by_shard: dict = {}
        for r in got:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r["position"])
            assert [r["position"] for r in rows] == list(range(len(rows)))
            # walking positions never decreases the bucket: staged
            assert [r["bucket"] for r in rows] == \
                sorted(r["bucket"] for r in rows)

    def test_partition_count_invariant(self, spark):
        a = {r["doc_id"]: (r["shard"], r["position"])
             for r in sampling.curriculum_order(
                 self._base(spark, parts=1), "doc_id", "bucket",
                 3).collect()}
        b = {r["doc_id"]: (r["shard"], r["position"])
             for r in sampling.curriculum_order(
                 self._base(spark, parts=13), "doc_id", "bucket",
                 3).collect()}
        assert a == b

    def test_within_bucket_order_matches_training_order_shuffle(self, spark):
        """Inside one bucket the relative order must be the plain
        salted-hash shuffle — curriculum staging must not bias it."""
        one_bucket = spark.range(50).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("bucket"))
        plain = {r["doc_id"]: r["position"]
                 for r in sampling.training_order(
                     one_bucket.select("doc_id"), "doc_id", 2).collect()}
        curr = {r["doc_id"]: r["position"]
                for r in sampling.curriculum_order(
                    one_bucket, "doc_id", "bucket", 2).collect()}
        assert curr == plain


class TestShuffleAudit:
    """shuffle_audit (r6): the shuffle must decorrelate adjacent docs."""

    def test_hash_order_decorrelates_but_sorted_does_not(self, spark, sf_dir):
        from twitter_to_sqlite_spark.plans import catalog

        got = catalog.q_shuffle_audit(spark, sf_dir).collect()
        assert got, "every shard must report"
        for r in got:
            assert r["lag1_corr"] is not None
            assert abs(r["lag1_corr"]) < 0.5, r   # hash order ~0
        # contrast: walk the SAME docs in length-sorted order -> corr ~1
        from twitter_to_sqlite_spark.functions.text import _tokens
        d = catalog._t(spark, sf_dir, "documents").select(
            "doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("x"))
        from pyspark.sql import Window
        w = Window.orderBy("x", "doc_id")
        o = d.withColumn("position", F.row_number().over(w) - 1)
        nxt = o.select((F.col("position") - 1).alias("position"),
                       F.col("x").alias("y"))
        p = o.join(nxt, "position")
        m = p.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        ).collect()[0]
        n, sx, sy = m["n"], float(m["sx"]), float(m["sy"])
        num = n * float(m["sxy"]) - sx * sy
        vx = n * float(m["sxx"]) - sx * sx
        vy = n * float(m["syy"]) - sy * sy
        sorted_corr = num / (vx ** 0.5) / (vy ** 0.5)
        assert sorted_corr > 0.9


class TestSoftDedupWeights:
    def test_cluster_mass_sums_to_one_and_singletons_weigh_one(
            self, spark, sf_dir):
        from twitter_to_sqlite_spark.plans import catalog

        rows = catalog.q_dedup_soft_weights(spark, sf_dir).collect()
        n_docs = catalog._docs_with_planted_dups(spark, sf_dir).count()
        assert len(rows) == n_docs
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], []).append(r)
        multi = [c for c, rs in by_cluster.items() if len(rs) > 1]
        assert multi, "planted dups must form clusters"
        for c, rs in by_cluster.items():
            assert all(r["cluster_size"] == len(rs) for r in rs)
            # each cluster contributes ~1 doc of training mass
            assert sum(r["weight"] for r in rs) == \
                pytest.approx(1.0, abs=1e-4)
        singles = [r for r in rows if r["cluster_size"] == 1]
        assert singles and all(r["weight"] == 1.0 for r in singles)


class TestMixtureOrder:
    """mixture_order (r6): every stratum advances proportionally."""

    def _base(self, spark, parts=5):
        # stratum 'a': 60 docs, 'b': 20, 'c': 20
        return spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 60, "a")
            .when(F.col("id") < 80, "b").otherwise("c").alias("lang"),
        ).repartition(parts)

    def test_prefixes_are_proportionally_mixed(self, spark):
        rows = sampling.mixture_order(
            self._base(spark), "doc_id", "lang").collect()
        rows.sort(key=lambda r: r["position"])
        assert [r["position"] for r in rows] == list(range(100))
        # any prefix holds each stratum in ~corpus proportion: after
        # k docs, stratum s contributes round(k * n_s/100) +- 1
        for k in (10, 25, 50, 75):
            seen = [r["lang"] for r in rows[:k]]
            for s, share in (("a", 0.6), ("b", 0.2), ("c", 0.2)):
                assert abs(seen.count(s) - k * share) <= 1, (k, s)

    def test_partition_count_invariant(self, spark):
        a = {r["doc_id"]: r["position"] for r in sampling.mixture_order(
            self._base(spark, parts=1), "doc_id", "lang").collect()}
        b = {r["doc_id"]: r["position"] for r in sampling.mixture_order(
            self._base(spark, parts=13), "doc_id", "lang").collect()}
        assert a == b


class TestDomainCaps:
    """domain_caps: the RefinedWeb max-N-per-domain quota via the
    equidepth hash-slice refinement — exact vs the brute-force
    per-domain window, planted hot domain actually capped."""

    @staticmethod
    def _hash60(key, salt=""):
        import hashlib

        return int(hashlib.md5(f"{key}{salt}".encode())
                   .hexdigest()[:15], 16)

    def _brute(self, rows, cap, salt=""):
        by_dom: dict = {}
        for dom, key in rows:
            by_dom.setdefault(dom, []).append(key)
        want = {}
        for dom, keys in by_dom.items():
            keys.sort(key=lambda k: (self._hash60(k, salt), k))
            for rank, k in enumerate(keys[:cap], start=1):
                want[(dom, k)] = rank
        return want

    def test_hot_domain_is_capped_cold_passes(self, spark):
        rows = [("hot", i) for i in range(2000)] + \
               [("cold", 10_000 + i) for i in range(5)]
        df = spark.createDataFrame(rows, "source string, doc_id long")
        got = {(r["source"], r["doc_id"]): r["domain_rank"]
               for r in sampling.domain_caps(
                   df, "source", cap=7, key_col="doc_id").collect()}
        from collections import Counter

        per_dom = Counter(dom for dom, _ in got)
        assert per_dom == {"hot": 7, "cold": 5}
        assert got == self._brute(rows, cap=7)

    def test_matches_brute_force_window_across_slice_widths(self, spark):
        # slices=4 forces multi-row slices (take-all AND boundary legs
        # both populated); slices=1024 puts ~every row in its own slice
        rows = [(f"d{i % 7}", i * 31 + 5) for i in range(400)]
        df = spark.createDataFrame(rows, "source string, doc_id long")
        want = self._brute(rows, cap=13, salt="s")
        for slices in (4, 64, 1024):
            got = {(r["source"], r["doc_id"]): r["domain_rank"]
                   for r in sampling.domain_caps(
                       df, "source", cap=13, key_col="doc_id",
                       salt="s", slices=slices).collect()}
            assert got == want, slices

    def test_null_domain_and_key_excluded_and_under_cap_kept(self, spark):
        rows = [("a", 1), ("a", 2), (None, 3), ("b", None), ("b", 4)]
        df = spark.createDataFrame(rows, "source string, doc_id long")
        got = sampling.domain_caps(df, "source", cap=10,
                                   key_col="doc_id").collect()
        assert {(r["source"], r["doc_id"]) for r in got} == \
            {("a", 1), ("a", 2), ("b", 4)}
        assert all(r["domain_rank"] <= 2 for r in got)


class TestDistributionMatch:
    """distribution_match: exact integer-ppm acceptance rates,
    deterministic keep set, under-represented bins untouched."""

    def _frames(self, spark):
        # incoming: 60 rows in bin 0, 20 in bin 5; target: uniform
        # 20/20 over the same two bins
        inc = [(i, 0.05) for i in range(60)] + \
              [(100 + i, 0.55) for i in range(20)]
        tgt = [(0.05,)] * 20 + [(0.55,)] * 20
        return (spark.createDataFrame(inc, "doc_id long, quality double"),
                spark.createDataFrame(tgt, "quality double"))

    def test_rates_are_exact_integer_ppm(self, spark):
        inc, tgt = self._frames(spark)
        rates = {r["bin"]: r for r in sampling.distribution_match_rates(
            inc, tgt, "quality", n_bins=10).collect()}
        # bin 0: target share 1/2, incoming share 3/4 -> rate 2/3
        assert rates[0]["rate_ppm"] == (1_000_000 * 20 * 80) // (40 * 60)
        # bin 5: target share 1/2, incoming share 1/4 -> clipped at 1
        assert rates[5]["rate_ppm"] == 1_000_000
        # empty bins: rate 0, zero counts
        assert rates[3]["rate_ppm"] == 0
        assert rates[3]["n_target"] == 0 and rates[3]["n_in"] == 0

    def test_supplied_rates_wrong_n_bins_raises(self, spark):
        import pytest as _pytest

        inc, tgt = self._frames(spark)
        rates = sampling.distribution_match_rates(
            inc, tgt, "quality", n_bins=5)
        with _pytest.raises(ValueError, match="5 rows but n_bins=10"):
            sampling.distribution_match(
                inc, tgt, "quality", "doc_id", n_bins=10, rates=rates)

    def test_supplied_rates_equal_internal_build(self, spark):
        inc, tgt = self._frames(spark)
        rates = sampling.distribution_match_rates(
            inc, tgt, "quality", n_bins=10)
        via_param = {r["doc_id"] for r in sampling.distribution_match(
            inc, tgt, "quality", "doc_id", n_bins=10, salt="s",
            rates=rates).collect()}
        internal = {r["doc_id"] for r in sampling.distribution_match(
            inc, tgt, "quality", "doc_id", n_bins=10,
            salt="s").collect()}
        assert via_param == internal

    def test_kept_set_matches_brute_force_hash_rule(self, spark):
        import hashlib

        inc, tgt = self._frames(spark)
        kept = {r["doc_id"] for r in sampling.distribution_match(
            inc, tgt, "quality", "doc_id", n_bins=10,
            salt="s").collect()}
        rates = {r["bin"]: r["rate_ppm"]
                 for r in sampling.distribution_match_rates(
                     inc, tgt, "quality", n_bins=10).collect()}

        def ppm(doc_id):
            return int(hashlib.md5(f"{doc_id}s".encode())
                       .hexdigest()[:15], 16) % 1_000_000

        want = {d for d, q in
                ([(i, 0.05) for i in range(60)]
                 + [(100 + i, 0.55) for i in range(20)])
                if ppm(d) < rates[int(q * 10)]}
        assert kept == want
        # the under-represented bin keeps everything
        assert {100 + i for i in range(20)} <= kept


class TestNormalizedDedup:
    def test_decorated_variants_collapse(self, spark):
        from twitter_to_sqlite_spark.functions import dedup as D

        rows = [(1, "Hello, World!"), (2, "hello world"),
                (3, "HELLO   world!!"), (4, "a different doc"),
                (5, "hello worlds")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["keep_id"]: r["n_dups"]
               for r in D.normalized_dedup(df).collect()}
        assert got == {1: 3, 4: 1, 5: 1}

    def test_digits_and_punct_stripped(self, spark):
        from twitter_to_sqlite_spark.functions.text import normalize_text

        df = spark.createDataFrame([("Ab3 ,c  d4!",)], "text string")
        assert df.select(normalize_text("text").alias("n")) \
            .collect()[0]["n"] == "ab c d"


def test_zipf_fit_recovers_planted_power_law(spark, tmp_path):
    """A corpus whose token frequencies are exactly c_r = floor(1000 /
    r^0.8) must fit slope ≈ -0.8 (log-log least squares on the exact
    planted spectrum — only floor() noise separates fit from truth)."""
    import math

    from twitter_to_sqlite_spark.plans import catalog

    rows = []
    did = 0
    for r in range(1, 101):
        c = int(1000 / r ** 0.8)
        for _ in range(c):
            rows.append((did, f"tok{r:03d}"))
            did += 1
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = catalog.q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert got["n_terms"] == 100
    assert abs(got["slope"] - (-0.8)) < 0.02
    # sanity: intercept ~ ln(1000)
    assert abs(got["intercept"] - math.log(1000)) < 0.1


def test_dsir_logweights_prefer_target_like_docs(spark):
    """DSIR law: a raw doc written in the TARGET slice's vocabulary
    must score a positive log-weight (keep), a doc in the off-target
    vocabulary a negative one — regardless of its own lang label
    (the score reads the text, not the label)."""
    from twitter_to_sqlite_spark.functions import sampling
    from pyspark.sql import functions as F

    en = "alpha beta gamma delta epsilon"
    de = "zork blub quux narf snarf"
    rows = ([(i, en, "en") for i in range(1, 5)]
            + [(i + 10, de, "de") for i in range(1, 5)]
            # raw-only probes: English-styled text labeled de, and
            # off-target-styled text labeled de
            + [(100, en, "de"), (101, de, "de")])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in sampling.dsir_logweights(
        df, F.col("lang") == "en").collect()}
    assert got[100]["logweight"] > 0 and got[100]["keep"]
    assert got[101]["logweight"] < 0 and not got[101]["keep"]
    # same text ⇒ same weight, target membership notwithstanding
    assert got[100]["logweight"] == got[1]["logweight"]
    assert got[101]["logweight"] == got[11]["logweight"]
    assert got[1]["n_feats"] == 4


def test_compaction_plan_packs_small_keeps_large(spark):
    """Planner law: files ≥ target are 'keep' (never grouped); small
    files pack greedily in key order with exact BIGINT prefix-sum
    groups, and every group's byte total is the sum of its members."""
    from twitter_to_sqlite_spark.operators import bucketing

    rows = [(1, 400), (2, 400), (3, 300), (4, 1000),  # 4 is large
            (5, 250), (6, 50)]
    m = spark.createDataFrame(rows, "shard long, n_bytes long")
    got = {r["shard"]: r for r in bucketing.compaction_plan(
        m, "shard", "n_bytes", 1000).collect()}
    assert got[4]["action"] == "keep" and got[4]["out_group"] is None
    # prefix sums (before each): 0,400,800,1100,1350 -> groups 0,0,0,1,1
    assert [got[i]["out_group"] for i in (1, 2, 3, 5, 6)] == [0, 0, 0, 1, 1]
    assert got[1]["group_bytes"] == 1100 and got[1]["n_in_group"] == 3
    assert got[5]["group_bytes"] == 300 and got[5]["n_in_group"] == 2


def test_lsh_band_plan_formula_and_choice(spark):
    """Planner law vs a hand-computed spectrum: per-leg fn/fp equal
    the repeated-squaring formula floored to ppm, and `chosen` is the
    (cost, r)-argmin. Pairs: one exact dup (s=1, never missed), one
    true pair at s=0.5, one false pair at s=1/7."""
    import math

    from twitter_to_sqlite_spark.functions import dedup as D

    def p2(x, e):
        for _ in range(e.bit_length() - 1):
            x = x * x
        return x

    rows = [(1, 2, 4, 4, 4),    # s=1.0, true
            (3, 4, 2, 3, 3),    # s=0.5, true (2*2 >= 4)
            (5, 6, 1, 4, 4)]    # s=1/7, false
    pairs = spark.createDataFrame(
        rows, "id_a long, id_b long, inter long, size_a long, size_b long")
    got = {(r["b"], r["r"]): r
           for r in D.lsh_band_plan(pairs, num_hashes=16).collect()}
    assert len(got) == 5 and sum(r["chosen"] for r in got.values()) == 1

    legs = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
    exp = {}
    for b, r in legs:
        fn = (math.floor(p2(1.0 - p2(1.0, r), b) * 1e6)
              + math.floor(p2(1.0 - p2(0.5, r), b) * 1e6))
        fp = math.floor((1.0 - p2(1.0 - p2(1.0 / 7.0, r), b)) * 1e6)
        exp[(b, r)] = (fn, fp)
    for leg, (fn, fp) in exp.items():
        assert (got[leg]["fn_ppm"], got[leg]["fp_ppm"]) == (fn, fp), leg
    want = min(legs, key=lambda br: (sum(exp[br]), br[1]))
    assert got[want]["chosen"]


def test_retrieval_eval_perfect_and_degraded_ranking(spark):
    """NDCG law on a planted corpus: when BM25's ranking happens to
    equal the ideal (every full-coverage doc outranks every partial
    one) NDCG = 1 and MRR = 1; a query whose full-coverage doc is
    longer (lower BM25) than single-term docs gets NDCG < 1 and
    MRR = 1/rank of that doc."""
    from twitter_to_sqlite_spark.operators import relational as R

    rows = [
        # q1: doc 1 has both terms, docs 2-3 one term -> ideal order
        (1, "apple banana"), (2, "apple pear plum"), (3, "banana kiwi"),
        # q2: doc 4 has both terms but is LONG and term-sparse; docs
        # 5-6 are short single-term docs that outscore it on BM25
        (4, "cat dog " + "filler words here and more padding " * 8),
        (5, "cat cat cat"), (6, "dog dog dog"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    idx = R.build_inverted_index(d, "doc_id", "text")
    qs = spark.createDataFrame(
        [(1, "apple"), (1, "banana"), (2, "cat"), (2, "dog")],
        "query_id long, term string")
    got = {r["query_id"]: r
           for r in R.retrieval_eval(idx, "doc_id", qs, k=10).collect()}
    assert got[1]["n_cands"] == 3
    assert got[1]["ndcg"] == 1.0 and got[1]["mrr"] == 1.0
    assert got[2]["n_cands"] == 3
    assert got[2]["ndcg"] < 1.0 and got[2]["mrr"] == round(1.0 / 3, 6)


def test_distinct_ngram_diversity_flags_templated_source(spark):
    """A source of near-identical templated docs must score far lower
    distinct-2 than a source of all-different docs; exact counts on a
    hand-built corpus."""
    from twitter_to_sqlite_spark.functions import text as T

    rows = ([(i, "the same boilerplate sentence", "tmpl")
             for i in range(10)]
            + [(100 + i, f"unique words w{i}a w{i}b w{i}c", "var")
               for i in range(10)])
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r
           for r in T.distinct_ngram_diversity(d, "source").collect()}
    t, v = got["tmpl"], got["var"]
    assert (t["n_docs"], t["n_tokens"], t["n_types"]) == (10, 40, 4)
    assert t["n_bigram_types"] == 3 and t["n_bigrams"] == 30
    assert v["n_types"] == 32  # 'unique','words' + 30 distinct w-tokens
    # 31 distinct of 40 bigrams ('unique words' repeats across docs)
    assert v["distinct2"] == 0.775 and t["distinct2"] == 0.1


def test_temperature_sweep_endpoints(spark):
    """α=1 reproduces raw shares (max_upsample = 1); α→small flattens
    the mix (entropy rises toward ln|strata|, max_share falls);
    exact values checked at α=1 for a 3:1 corpus."""
    import math

    from twitter_to_sqlite_spark.functions import sampling

    rows = [("a", 30), ("a", 30), ("a", 30), ("b", 30)]
    d = spark.createDataFrame(rows, "lang string, n_tokens long")
    got = {r["alpha"]: r for r in sampling.temperature_sweep(
        d, "lang", "n_tokens", [0.2, 1.0]).collect()}
    one = got[1.0]
    assert one["n_strata"] == 2
    assert one["max_share"] == 0.75 and one["min_share"] == 0.25
    assert one["max_upsample"] == 1.0
    assert one["entropy"] == round(
        -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)), 6)
    lo = got[0.2]
    assert lo["max_share"] < 0.75 and lo["entropy"] > one["entropy"]
    assert lo["max_upsample"] > 1.0  # the rare stratum gets upsampled


def test_padding_waste_hand_computed(spark):
    from twitter_to_sqlite_spark.functions.sampling import padding_waste

    # lengths: 10, 30, 60, 90 — scheme [32, 64]: 10→32 (pad 22),
    # 30→32 (pad 2), 60→64 (pad 4), 90→trunc to 64 (trunc 26, pad 0)
    df = spark.createDataFrame(
        [(10,), (30,), (60,), (90,)], "n long")
    r = {x["scheme"]: x for x in
         padding_waste(df, "n", {"ab": [32, 64]}).collect()}["ab"]
    assert r["n_docs"] == 4
    assert r["total_tokens"] == 190
    assert r["padded_tokens"] == 28
    assert r["truncated_tokens"] == 26
    # kept = 10+30+60+64 = 164; waste = 28 / (28+164)
    assert r["waste_frac"] == round(28 / 192, 6)


def test_padding_waste_histogram_multiplicity(spark):
    from twitter_to_sqlite_spark.functions.sampling import padding_waste

    df = spark.createDataFrame([(5,)] * 7 + [(8,)] * 3, "n long")
    r = padding_waste(df, "n", {"one": [8]}).collect()[0]
    assert r["n_docs"] == 10
    assert r["padded_tokens"] == 7 * 3  # 5→8 pads 3, 8→8 pads 0
    assert r["truncated_tokens"] == 0


def test_epoch_schedule_sqrt_weights_and_cap(spark):
    from twitter_to_sqlite_spark.functions.sampling import epoch_schedule

    # tokens: a=100 (w=10), b=400 (w=20) → W=30. budget 3000:
    # a's share = 3000/3 = 1000 tokens over a 100-token source → 10
    # epochs; b's share = 2000 over 400 → 5 epochs.
    rows = [("a", 100), ("b", 400)]
    df = spark.createDataFrame(rows, "src string, n long")
    out = {r["source"]: r for r in
           epoch_schedule(df, "src", "n", budget_tokens=3000,
                          max_epochs=7.0).collect()}
    assert out["a"]["weight_ppm"] == 333333
    assert out["b"]["weight_ppm"] == 666666
    assert out["a"]["epochs"] == 10.0 and out["a"]["over_cap"]
    assert out["b"]["epochs"] == 5.0 and not out["b"]["over_cap"]


def test_semantic_contamination_planted_only(spark):
    from twitter_to_sqlite_spark.functions.similarity import (
        semantic_contamination,
    )

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    train = spark.createDataFrame(
        [(10, [0.71, 0.7]),          # cos ≈ .707 to both — clean
         (11, [2.0, 0.0]),           # scaled copy of eval 0 — leak
         (12, [0.0, -3.0])],         # anti-parallel — clean
        "vec_id long, embedding array<float>")
    rows = semantic_contamination(train, ev, threshold=0.99).collect()
    assert [(r["vec_id"], r["matched_eval_id"], r["cosine"])
            for r in rows] == [(11, 0, 1.0)]


def test_code_detect_separates_code_from_prose(spark):
    from twitter_to_sqlite_spark.functions.text import code_detect

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and"),
        (2, "def f(x): return [i for i in range(x)]; import sys;"
            " class A: pass"),
        (3, "if the weather holds for the picnic we shall return"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in code_detect(df).collect()}
    assert out[2]["is_code"]
    assert not out[1]["is_code"]
    # doc 3 has keywords (if, return) but zero symbol density —
    # the AND keeps prose with incidental keywords clean
    assert out[3]["kw_hits"] >= 2 and not out[3]["is_code"]


def test_group_kfold_partitions_groups_exactly_once(spark):
    from twitter_to_sqlite_spark.functions.sampling import (
        _key_hash, group_kfold,
    )

    df = spark.createDataFrame(
        [(u, i) for u in range(40) for i in range(3)],
        "user_id long, x long")
    out = group_kfold(df, "user_id", k=4).collect()
    assert sum(r["n_groups"] for r in out) == 40     # every group once
    assert sum(r["n_rows"] for r in out) == 120
    assert {r["fold"] for r in out} <= {0, 1, 2, 3}
    # fold is a pure function of the group: recompute one user's fold
    # directly and check its rows all land there
    one = (df.filter(F.col("user_id") == 7)
           .select((_key_hash(F.col("user_id"), "kf") % 4).alias("f"))
           .distinct().collect())
    assert len(one) == 1


def test_gate_ablation_sole_blocker_attribution(spark):
    from twitter_to_sqlite_spark.functions.text import gate_ablation

    good = ("the cat and a dog sat on it for a while and the story "
            "went on and on for quite a while longer today")
    short = "the cat and the dog"                     # fails words only
    symbols = good + " " + "#" * 40                   # fails symbols only
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string")
    out = {r["gate"]: r for r in gate_ablation(df).collect()}
    assert out["pass_words"]["n_docs"] == 3
    assert out["pass_words"]["n_keep"] == 1
    assert out["pass_words"]["n_fail"] == 1
    assert out["pass_words"]["n_sole_blocker"] == 1
    assert out["pass_symbols"]["n_fail"] == 1
    assert out["pass_symbols"]["n_sole_blocker"] == 1
    for g in ("pass_word_len", "pass_alpha", "pass_stopwords"):
        assert out[g]["n_fail"] == 0 and out[g]["n_sole_blocker"] == 0


def test_token_entropy_uniform_and_degenerate(spark):
    import math

    from twitter_to_sqlite_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert out[2]["entropy"] == round(math.log(4), 6)
    assert out[3]["entropy"] == round(math.log(2), 6)


def test_bloom_fpr_audit_counts_match_probe_expression(spark):
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark.functions import bloom

    dim = spark.createDataFrame([(i,) for i in range(30)], "k long")
    probes = spark.createDataFrame(
        [(i,) for i in range(1000, 1200)], "k long")
    r = bloom.bloom_fpr_audit(dim, probes, "k", m_words=4, k=3) \
        .collect()[0]
    assert r["n_keys"] == 30 and r["n_probes"] == 200
    assert 0.0 <= r["fpr_theory"] <= 1.0
    # cross-check the FP count against a direct might_contain scan
    words = bloom.build_bloom(dim.select(F.col("k")), "k", 4, 3,
                              hash_fn="md5")
    manual = probes.filter(
        bloom.might_contain(F.col("k"), words, 3, hash_fn="md5")).count()
    assert r["n_false_pos"] == manual
    # no false negatives ever: every member key must probe true
    members = dim.filter(
        bloom.might_contain(F.col("k"), words, 3, hash_fn="md5")).count()
    assert members == 30


def test_vocab_sweep_matches_brute_force_ranking(spark):
    from collections import Counter

    from twitter_to_sqlite_spark.functions.text import (
        vocab_coverage_sweep,
    )

    texts = ["a a a a b b b c c d", "a b c d e f", "g g g g g g g a"]
    counts = Counter(w for t in texts for w in t.split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    sizes = [1, 2, 3, 5, 100]
    out = {r["vocab_size"]: r for r in
           vocab_coverage_sweep(df, "text", sizes).collect()}
    for v in sizes:
        # ANY tie-break admits the same token mass — brute force over
        # every rank order sharing the frequency sort agrees, so the
        # canonical one suffices as the spec
        want = sum(c for _, c in ranked[:v])
        assert out[v]["covered"] == want, v
        assert out[v]["n_total"] == total
        assert out[v]["coverage"] == round(want / total, 6)
    assert out[100]["covered"] == total and out[100]["oov_rate"] == 0.0


def test_gini_concentration_extremes(spark):
    from twitter_to_sqlite_spark.functions.sampling import (
        gini_concentration,
    )

    even = spark.createDataFrame(
        [(f"s{i}", 100) for i in range(4) for _ in range(1)],
        "src string, w long")
    r = gini_concentration(even, "src", "w").collect()[0]
    assert r["n_strata"] == 4 and r["gini"] == 0.0

    # one stratum owns ~everything: G → (n-1)/n · (1 - eps)
    skew = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 997)], "src string, w long")
    g = gini_concentration(skew, "src", "w").collect()[0]["gini"]
    # exact: sorted x = [1,1,1,997], Σi·xi = 1+2+3+4·997 = 3994
    # G = 2·3994/(4·1000) − 5/4 = 1.997 − 1.25 = 0.747
    assert g == 0.747


def test_fano_factor_poisson_vs_bursty(spark):
    import datetime as dt

    from twitter_to_sqlite_spark.functions.stats import fano_factor

    base = dt.datetime(2024, 1, 1)
    rows = []
    # "steady": exactly 3 events every hour for 10 hours → variance 0
    for h in range(10):
        for k in range(3):
            rows.append(("steady", base + dt.timedelta(hours=h,
                                                       minutes=k)))
    # "bursty": 30 events in hour 0, nothing for 9 hours, 1 in hour 9
    rows += [("bursty", base + dt.timedelta(minutes=m))
             for m in range(30)]
    rows.append(("bursty", base + dt.timedelta(hours=9)))
    df = spark.createDataFrame(rows, "t string, ts timestamp")
    out = {r["t"]: r for r in fano_factor(df, "t", "ts").collect()}
    assert out["steady"]["n_hours"] == 10
    assert out["steady"]["fano"] == 0.0
    assert out["bursty"]["n_hours"] == 10
    assert out["bursty"]["fano"] > 5.0


def test_table_checksum_detects_single_cell_change(spark, tmp_path):
    from twitter_to_sqlite_spark.plans import catalog

    base = spark.createDataFrame(
        [(1, 2, "O", 10.0, None, "p"), (2, 3, "F", 20.0, None, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string")
    base.write.parquet(str(tmp_path / "orders.parquet"))
    a = catalog.q_table_checksum(spark, str(tmp_path)).collect()[0]
    import shutil
    shutil.rmtree(str(tmp_path / "orders.parquet"))
    changed = spark.createDataFrame(
        [(1, 2, "O", 10.01, None, "p"), (2, 3, "F", 20.0, None, "p")],
        base.schema)
    changed.write.parquet(str(tmp_path / "orders.parquet"))
    b = catalog.q_table_checksum(spark, str(tmp_path)).collect()[0]
    assert a["n_rows"] == b["n_rows"] == 2
    assert a["checksum"] != b["checksum"]


def test_er_eval_planted_misses_bound_recall(spark):
    from twitter_to_sqlite_spark.plans import catalog

    r = catalog.q_er_eval(spark, "/root/testdata/sf0.001").collect()[0]
    # every predicted pair is a planted pair (synthetic universe has
    # no organic near-dups) → precision exactly 1; the ≥3-edit
    # rewrites are unreachable at max_distance=3 → recall < 1
    assert r["fp"] == 0 and r["prec"] == 1.0
    assert r["fn"] > 0 and r["rec"] < 1.0
    assert r["tp"] + r["fn"] == r["n_truth"]


def test_quality_sweep_is_monotone(spark):
    from twitter_to_sqlite_spark.plans import catalog

    rows = sorted(catalog.q_quality_sweep(
        spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["tau"])
    kept = [r["n_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)     # tighter gate keeps less
    fr = [r["frac_kept"] for r in rows]
    assert all(0.0 <= f <= 1.0 for f in fr)
    # mean kept quality never drops below the cutoff that admitted it
    for r in rows:
        if r["mean_kept_quality"] is not None and r["n_kept"] > 0:
            assert r["mean_kept_quality"] >= r["tau"] - 1e-9


def test_partition_checksums_localize_the_divergent_partition(
        spark, tmp_path):
    from twitter_to_sqlite_spark.plans import catalog

    schema = ("o_orderkey long, o_custkey long, o_orderstatus string,"
              " o_totalprice double, o_orderdate timestamp,"
              " o_orderpriority string")
    rows = [(i, 1, "O", 10.0 + i, None,
             "1-URGENT" if i % 2 == 0 else "2-HIGH") for i in range(20)]
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "orders.parquet"))
    a = {r["partition_key"]: r["checksum"]
         for r in catalog.q_partition_checksums(
             spark, str(tmp_path)).collect()}
    import shutil
    shutil.rmtree(str(tmp_path / "orders.parquet"))
    rows[4] = (4, 1, "F", 14.0, None, "1-URGENT")  # one cell flipped
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "orders.parquet"))
    b = {r["partition_key"]: r["checksum"]
         for r in catalog.q_partition_checksums(
             spark, str(tmp_path)).collect()}
    assert a["1-URGENT"] != b["1-URGENT"]     # localized
    assert a["2-HIGH"] == b["2-HIGH"]         # untouched side certified


class TestDmMaintained:
    """dm_maintained's law: rates derived from a drift_monitor-
    MAINTAINED histogram equal rates recomputed one-shot — for ANY
    batch split, because bin counts merge by integer addition."""

    def test_maintained_rates_equal_one_shot(self, spark, tmp_path):
        from twitter_to_sqlite_spark.streaming import analytics as SA

        inc = spark.createDataFrame(
            [(i, (i % 10) / 10.0 + 0.05) for i in range(90)],
            "doc_id long, quality double").localCheckpoint(eager=True)
        tgt = spark.createDataFrame(
            [((i % 4) / 10.0 + 0.05,) for i in range(40)],
            "quality double")
        path = str(tmp_path / "hist")
        on = SA.drift_monitor(spark, path, "quality")
        # an uneven, non-contiguous split
        for b, pred in enumerate(["doc_id % 7 < 2", "doc_id % 7 = 2",
                                  "doc_id % 7 > 2"]):
            on(inc.filter(pred).select("quality"), b)
        n_in = {r["bin"]: r["n"]
                for r in spark.read.parquet(path).collect()}
        one_shot = {r["bin"]: r["n"] for r in SA.score_bin_counts(
            inc.select("quality"), "quality", 10).collect()}
        assert n_in == one_shot
        # the derived control signal is therefore identical too
        # the rates derived from the MAINTAINED histogram must equal
        # an INDEPENDENT reference: distribution_match_rates run on
        # the raw frames (different code path, same ppm op tree) —
        # this pins min/floor-div/zero-guard, not just count equality
        tgt_h = {r["bin"]: r["n"] for r in SA.score_bin_counts(
            tgt, "quality", 10).collect()}
        T, N = sum(tgt_h.values()), sum(n_in.values())
        ref = {r["bin"]: r["rate_ppm"]
               for r in sampling.distribution_match_rates(
                   inc.select("quality"), tgt, "quality",
                   n_bins=10).collect()}
        for b in range(10):
            t, c = tgt_h.get(b, 0), n_in.get(b, 0)
            maintained = min(1_000_000, (1_000_000 * t * N) // (T * c)) \
                if c and T else 0
            assert maintained == ref[b], b
