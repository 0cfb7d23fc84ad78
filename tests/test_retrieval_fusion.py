"""Hybrid-retrieval fusion, ANN recall eval, and corpus-level
duplicated-n-gram stats: semantic laws on tiny known inputs plus
scale-shape checks on the sf0.001 tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.functions import dedup, similarity

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- rrf


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_known_values(spark):
    """Fused score is exactly Σ 1/(60+rank); docs in both legs beat
    docs in one leg at comparable ranks; ties break by doc_id."""
    lex = _leg(spark, [(1, 1), (2, 2), (3, 3)])
    sem = _leg(spark, [(2, 1), (4, 2)])
    out = {
        r["doc_id"]: r
        for r in similarity.rrf_fuse([lex, sem], "doc_id", k=10).collect()
    }
    assert out[2]["n_legs"] == 2
    assert abs(out[2]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(out[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    # doc 2 (both legs) outranks doc 1 (single leg, best rank)
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2
    # all four docs surface, ranks are 1..4 with no gaps
    assert sorted(r["rank"] for r in out.values()) == [1, 2, 3, 4]


def test_rrf_top_k_truncates(spark):
    lex = _leg(spark, [(i, i) for i in range(1, 30)])
    out = similarity.rrf_fuse([lex], "doc_id", k=5).collect()
    assert len(out) == 5
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5]


def test_rrf_tie_breaks_by_id(spark):
    lex = _leg(spark, [(7, 1), (3, 2)])
    sem = _leg(spark, [(3, 1), (7, 2)])
    out = similarity.rrf_fuse([lex, sem], "doc_id", k=2).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in out}
    # identical fused scores -> lower doc_id first
    assert by_rank == {1: 3, 2: 7}


# ------------------------------------------------------------- recall


def test_recall_at_k_bounds_and_identity(spark):
    e = tables.load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(e, q, k=3)
    # identity: recall of exact vs itself is 1.0 for every query
    perfect = similarity.recall_at_k(exact, exact, k=3).collect()
    assert len(perfect) == 5
    assert all(r["recall"] == 1.0 and r["n_hits"] == 3 for r in perfect)
    # LSH recall is in [0, 1] and every query appears even on miss
    approx = similarity.lsh_bucketed_topk(e, q, k=3, dims=[0, 8, 16, 24])
    rec = similarity.recall_at_k(exact, approx, k=3).collect()
    assert len(rec) == 5
    assert all(0.0 <= r["recall"] <= 1.0 for r in rec)


def test_recall_zero_for_disjoint(spark):
    exact = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, neighbor_id long")
    approx = spark.createDataFrame(
        [(0, 9)], "query_id long, neighbor_id long")
    rec = similarity.recall_at_k(exact, approx, k=2).collect()
    assert rec == [type(rec[0])(query_id=0, n_hits=0, recall=0.0)]


# ----------------------------------------------------- dup ngram frac


def test_dup_ngram_frac_planted_copy(spark):
    """An exact copy scores dup_frac 1.0 on both members; a unique doc
    scores 0.0; counts are per-distinct-shingle."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),           # exact copy of 1
            (3, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.dup_ngram_stats(docs, "doc_id", "text", k=3).collect()}
    assert out[1]["n_shingles"] == 3          # 5 tokens -> 3 trigrams
    assert out[1]["dup_frac"] == 1.0 == out[2]["dup_frac"]
    assert out[3]["dup_frac"] == 0.0
    assert out[3]["n_dup"] == 0


def test_dup_ngram_frac_partial_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y z p q"),
            (2, "x y z r s"),   # shares exactly the 'x y z' trigram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.dup_ngram_stats(docs, "doc_id", "text", k=3).collect()}
    assert out[1]["n_dup"] == 1 and out[1]["n_shingles"] == 3
    assert out[1]["dup_frac"] == round(1 / 3, 4)


def test_dup_ngram_no_pair_join_in_plan(spark):
    """The dup-ngram plan must contain no join at all — it is two
    aggregation shuffles, never pair generation."""
    d = tables.load_table(spark, SF, "documents")
    plan = dedup.dup_ngram_stats(d, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan


# ------------------------------------------------------------ sq8 ann


def test_sq8_matches_brute_force_shape_and_recall(spark):
    """8-bit symmetric quantization with 10-candidate rescore loses no
    recall on the sf0.001 corpus (quantization error ≪ neighbor
    gaps); output shape is identical to brute force."""
    e = tables.load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(e, q, k=3)
    sq = similarity.sq8_topk(e, q, k=3, candidates=10)
    assert sq.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    rows = sq.collect()
    assert len(rows) == 15 and all(1 <= r["rank"] <= 3 for r in rows)
    rec = similarity.recall_at_k(exact, sq, k=3).collect()
    assert all(r["recall"] == 1.0 for r in rec)


def test_sq8_rescore_scores_are_exact(spark):
    """Final cosines come from the EXACT vectors (quantization only
    selects candidates): every (query, neighbor) cosine equals the
    brute-force cosine for that pair."""
    e = tables.load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    bf = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in similarity.brute_force_topk(e, q, k=20).collect()}
    for r in similarity.sq8_topk(e, q, k=3, candidates=10).collect():
        assert bf[(r["query_id"], r["neighbor_id"])] == r["cosine"]


# ----------------------------------------------------------- pagerank


def test_pagerank_regular_graph_is_uniform(spark):
    """On a regular graph (symmetric 2-cycle) the uniform vector is
    the fixed point: rank stays exactly 1.0."""
    from twitter_to_sqlite_spark.functions import graph

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = graph.pagerank(edges, iterations=4).collect()
    assert sorted((r["node"], r["rank"]) for r in out) == [(1, 1.0), (2, 1.0)]


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    """Symmetrized star: the hub outranks every leaf; with no dangling
    nodes total rank mass stays |V| (up to rounding)."""
    from twitter_to_sqlite_spark.functions import graph

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)],
        "src long, dst long",
    )
    pr = {r["node"]: r["rank"] for r in
          graph.pagerank(star, iterations=6).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 5))
    assert all(pr[1] == pr[i] for i in range(2, 5))  # leaves symmetric
    assert abs(sum(pr.values()) - 5.0) < 1e-4


def test_sq8_broadcasts_queries_no_sortmergejoin(spark):
    """The quantized scan keeps the brute-force shape: query side
    broadcast, corpus never exchanged into a SortMergeJoin."""
    e = tables.load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    plan = similarity.sq8_topk(e, q, k=3, candidates=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_param_sweep_discriminates_length_norm(spark):
    """Planted corpus where length normalization decides the ranking:
    q2's full-coverage doc is long and term-sparse, so b=0.75 ranks
    two short single-term docs above it (NDCG < 1) while b=0 scores
    raw tf·idf and restores it to the top (NDCG = 1). The sweep must
    mark a b=0 leg chosen, not the FTS5 default."""
    from twitter_to_sqlite_spark.operators import relational as R

    rows = [
        (1, "apple banana"), (2, "apple pear plum"), (3, "banana kiwi"),
        (4, "cat dog " + "filler words here and more padding " * 8),
        (5, "cat cat cat"), (6, "dog dog dog"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    idx = R.build_inverted_index(d, "doc_id", "text")
    qs = spark.createDataFrame(
        [(1, "apple"), (1, "banana"), (2, "cat"), (2, "dog")],
        "query_id long, term string")
    got = {(r["k1"], r["b"]): r for r in R.bm25_param_sweep(
        idx, "doc_id", qs, [(1.2, 0.75), (1.2, 0.0)], k=10).collect()}
    assert got[(1.2, 0.0)]["mean_ndcg"] == 1.0
    assert got[(1.2, 0.75)]["mean_ndcg"] < 1.0
    assert got[(1.2, 0.0)]["chosen"] and not got[(1.2, 0.75)]["chosen"]
    assert sum(r["chosen"] for r in got.values()) == 1


# --------------------------------------- fused bm25 sweep (r10)


def test_bm25_param_sweep_matches_per_leg_eval(spark):
    """The r10-fused bm25_param_sweep (one postings pipeline, per-grid
    score columns, shared ideal ranking) must produce EXACTLY the rows
    the original per-leg formulation produced: each (k1, b) leg
    re-derived here with a stand-alone retrieval_eval call, then the
    same rank-ordered mean fold and argmax."""
    from twitter_to_sqlite_spark.operators import relational as R

    d = tables.load_table(spark, SF, "documents").select("doc_id", "text")
    idx = R.build_inverted_index(d, "doc_id", "text").localCheckpoint()
    qs = spark.createDataFrame(
        [(1, "the"), (1, "data"), (2, "model"), (2, "training"),
         (3, "quality"), (3, "the")],
        "query_id long, term string")
    grid = [(1.2, 0.75), (0.9, 0.4), (1.6, 0.75), (1.2, 0.0)]

    # The pre-r10 formulation, verbatim: per-leg retrieval_eval union
    # + the same rank-ordered mean fold and argmax tail.
    from pyspark.sql import Window

    legs = None
    for k1, b in grid:
        leg = R.retrieval_eval(idx, "doc_id", qs, k=10,
                               k1=k1, b=b).select(
            F.lit(float(k1)).alias("k1"), F.lit(float(b)).alias("b"),
            "query_id", "ndcg", "mrr")
        legs = leg if legs is None else legs.unionByName(leg)
    terms = legs.groupBy("k1", "b").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sort_array(F.collect_list(
            F.struct("query_id", "ndcg", "mrr"))).alias("__ts"))

    def mean(f):
        return (F.aggregate("__ts", F.lit(0.0),
                            lambda acc, s: acc + s[f])
                / F.col("n_queries"))

    scored = terms.select(
        "k1", "b", "n_queries",
        F.round(mean("ndcg"), 6).alias("mean_ndcg"),
        F.round(mean("mrr"), 6).alias("mean_mrr"))
    w = Window.orderBy(F.col("mean_ndcg").desc(),
                       F.col("mean_mrr").desc(), "k1", "b")
    expected = {tuple(r) for r in scored.withColumn(
        "chosen", F.row_number().over(w) == 1).collect()}

    got = {tuple(r) for r in
           R.bm25_param_sweep(idx, "doc_id", qs, grid, k=10).collect()}
    assert got == expected


def test_injected_bm25_front_matches_self_computed(spark):
    """The r11 shared `_bm25_eval_front` injection must reproduce the
    self-computed rows exactly for BOTH consumers (retrieval_eval and
    bm25_param_sweep) — the front is the same frame, checkpointed
    once instead of derived per query."""
    from twitter_to_sqlite_spark.operators import relational as R

    d = tables.load_table(spark, SF, "documents").select("doc_id", "text")
    idx = R.build_inverted_index(d, "doc_id", "text").localCheckpoint()
    qs = spark.createDataFrame(
        [(1, "the"), (1, "data"), (2, "model"), (2, "training")],
        "query_id long, term string")
    scored, qn = R._bm25_eval_front(idx, "doc_id", qs)
    front = (scored.localCheckpoint(), qn)
    grid = [(1.2, 0.75), (0.9, 0.4)]

    pairs = [
        (R.retrieval_eval(idx, "doc_id", qs, k=10),
         R.retrieval_eval(None, "doc_id", qs, k=10, front=front)),
        (R.bm25_param_sweep(idx, "doc_id", qs, grid, k=10),
         R.bm25_param_sweep(None, "doc_id", qs, grid, k=10, front=front)),
    ]
    for plain, injected in pairs:
        assert plain.exceptAll(injected).count() == 0
        assert injected.exceptAll(plain).count() == 0


# ------------------------------------------- fused ann_tuning (r10)


def test_ann_tuning_matches_per_leg_operators(spark):
    """The r10-fused ann_tuning sweep (one pair set, predicate legs,
    join-free hit counting) must produce EXACTLY the rows the original
    per-leg formulation produced: each leg re-derived here with the
    stand-alone operators (lsh_bucketed_topk / ivf_topk / sq8_topk +
    recall_at_k against a shared brute-force leg)."""
    from twitter_to_sqlite_spark.plans import _q04_analytics as q4

    e = tables.load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < q4._TUNE_NQ)
    exact = similarity.brute_force_topk(e, q, k=q4._TUNE_K)
    cents = q4._ivf_centroids(spark, SF)

    def leg(method, setting, approx):
        rec = similarity.recall_at_k(exact, approx, k=q4._TUNE_K)
        row = rec.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_hits").alias("h")).collect()[0]
        avg = (round(row["h"] / (q4._TUNE_K * row["n"]), 4)
               if row["n"] else None)
        return (method, setting, row["n"], avg)

    expected = set()
    for bits, dims in q4._TUNE_LSH_BITS.items():
        expected.add(leg("lsh", f"bits={bits}",
                         similarity.lsh_bucketed_topk(
                             e, q, k=q4._TUNE_K, dims=dims)))
    expected.add(leg("lsh_multiprobe", "bits=4,probe=1",
                     similarity.lsh_bucketed_topk(
                         e, q, k=q4._TUNE_K, dims=q4._TUNE_LSH_BITS[4],
                         multiprobe=1)))
    for p in q4._TUNE_IVF_PROBES:
        expected.add(leg("ivf", f"n_probe={p}",
                         similarity.ivf_topk(e, q, cents, k=q4._TUNE_K,
                                             n_probe=p)))
    for c in q4._TUNE_SQ8_CANDS:
        expected.add(leg("sq8", f"cands={c}",
                         similarity.sq8_topk(e, q, k=q4._TUNE_K,
                                             candidates=c)))

    got = {(r["method"], r["setting"], r["n_queries"], r["avg_recall"])
           for r in q4.q_ann_tuning(spark, SF).collect()}
    assert got == expected
