"""FTS index persistence tests + ANN recall measurement (the quality
evidence for the LSH scale path: bucketing must trade little recall
for its candidate-set reduction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.database import TweetDatabase
from twitter_to_sqlite_spark.functions import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def db(spark, tmp_path):
    d = TweetDatabase(spark, str(tmp_path / "db"))
    docs = tables.load_table(spark, SF, "documents").withColumnRenamed("doc_id", "id")
    d.overwrite("docs", docs)
    return d


def test_build_and_search_fts(spark, db):
    name = db.build_fts("docs", "id", ["text"])
    assert name == "docs_fts"
    idx = db.read("docs_fts")
    assert set(idx.columns) == {"term", "id", "tf"}
    hits = db.search_fts("docs", ["spark", "join"])
    # every hit really contains both terms
    bad = hits.filter(
        ~F.col("text").rlike(r"\bspark\b") | ~F.col("text").rlike(r"\bjoin\b")
    ).count()
    assert bad == 0
    # parity with a direct scan
    direct = db.read("docs").filter(
        F.col("text").rlike(r"\bspark\b") & F.col("text").rlike(r"\bjoin\b")
    ).count()
    assert hits.count() == direct


def test_fts_any_mode(spark, db):
    db.build_fts("docs", "id", ["text"])
    any_hits = db.search_fts("docs", ["spark", "join"], mode="any").count()
    all_hits = db.search_fts("docs", ["spark", "join"], mode="all").count()
    assert any_hits >= all_hits > 0


def test_fts_bm25_ranking_semantics(spark, db):
    """bm25 scores: every ranked doc matches all terms; a doc that
    mentions a term more often (same length) scores higher; a rare
    term outweighs a common one (idf)."""
    from twitter_to_sqlite_spark.operators import relational as R

    docs = spark.createDataFrame(
        [
            (1, "spark join spark join filler words here"),
            (2, "spark join filler filler filler words here"),
            (3, "spark only words filler filler filler here"),
            (4, "unrelated text entirely about gardens roses"),
            (5, "spark join spark join spark join spark join"),
        ],
        "id long, text string",
    )
    idx = R.build_inverted_index(docs, "id", "text")
    out = {r["id"]: r["score"] for r in
           R.fts_bm25(idx, "id", ["spark", "join"]).collect()}
    # AND semantics: only docs containing both terms are ranked.
    assert set(out) == {1, 2, 5}
    # more occurrences of the query terms → higher score
    assert out[5] > out[1] > out[2]
    # any-mode includes the one-term doc, scored lower than full matches
    any_out = {r["id"]: r["score"] for r in
               R.fts_bm25(idx, "id", ["spark", "join"], mode="any").collect()}
    assert set(any_out) == {1, 2, 3, 5}
    assert any_out[3] < any_out[2]


def test_lsh_topk_recall_vs_brute_force(spark):
    """Sign-LSH ANN must keep reasonable top-3 recall on the synthetic
    embeddings while probing only its bucket (16 buckets → ~6% of
    candidate pairs)."""
    emb = tables.load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    k = 3
    exact = similarity.brute_force_topk(emb, queries, k)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall_of(**kw):
        approx = similarity.lsh_bucketed_topk(emb, queries, k, **kw)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(e & a) / len(e), approx

    # single probe: random 64-d embeddings are the LSH worst case
    # (neighbor cos ≈ 0.35 → per-bit agreement ≈ 0.61 → ~0.61^4);
    # must still beat the 1/16 random-bucket baseline
    r0, _ = recall_of()
    assert r0 >= 0.1, f"single-probe recall {r0}"
    # multiprobe radius 1 probes 5/16 buckets and must recover most
    # of the loss (~p^4 + 4p^3(1-p) ≈ 0.5 expected)
    r1, approx = recall_of(multiprobe=1)
    assert r1 >= 0.4, f"multiprobe-1 recall {r1}"
    # radius 2: diminishing returns but strictly more
    r2, _ = recall_of(multiprobe=2)
    assert r2 >= r1
    per_q = approx.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= k


def test_embedding_near_dup_planted(spark):
    emb = tables.load_table(spark, SF, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    pairs = similarity.embedding_near_dup_pairs(
        emb.unionByName(planted), threshold=0.99
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(i, i + 10_000) for i in range(5)} <= found


def test_ivf_kmeans_centroids_beat_standin(spark):
    """VERDICT r1 #4: data-adaptive k-means centroids must beat the old
    'first 8 vectors' stand-in on recall vs brute force (measured:
    standin 0.467/0.611 at n_probe=1/2; kmeans iters=3 0.5/0.711)."""
    emb = tables.load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    k = 3
    exact = similarity.brute_force_topk(emb, queries, k)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    standin = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    km = similarity.kmeans_centroids(emb, 8, iters=3)

    def recall(cents, n_probe):
        approx = similarity.ivf_topk(emb, queries, cents, k, n_probe=n_probe)
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(e & a) / len(e)

    for n_probe in (1, 2):
        r_std, r_km = recall(standin, n_probe), recall(km, n_probe)
        assert r_km >= r_std, f"n_probe={n_probe}: kmeans {r_km} < standin {r_std}"
    assert recall(km, 2) >= 0.65
    # empty-cell handling: k larger than natural clusters still returns
    # exactly k centroid vectors
    assert len(similarity.kmeans_centroids(emb.limit(20), 8, iters=2)) == 8


def test_ivf_multi_iter_beats_single_iteration(spark):
    """VERDICT r2 #8: the catalog's 3-iteration Lloyd's must match or
    beat the old single iteration at equal n_probe (measured 0.5/0.711
    vs 0.489/0.622 at n_probe=1/2)."""
    emb = tables.load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(emb, queries, 3).collect()}

    def recall(cents, n_probe):
        a = {(r["query_id"], r["neighbor_id"]) for r in
             similarity.ivf_topk(emb, queries, cents, 3, n_probe=n_probe).collect()}
        return len(exact & a) / len(exact)

    one = similarity.kmeans_centroids(emb, 8, iters=1)
    three = similarity.kmeans_centroids(emb, 8, iters=3)
    for n_probe in (1, 2):
        assert recall(three, n_probe) >= recall(one, n_probe)


def test_kmeans_hash_sample_matches_manual_filter(spark):
    """sample_mod uses the portable md5-hash subset — identical to
    clustering a manually filtered corpus, and engine-reproducible
    (the same predicate is expressible in the DuckDB oracle)."""
    emb = tables.load_table(spark, SF, "embeddings")
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    manual = emb.filter(h % 2 == 0)
    assert (similarity.kmeans_centroids(emb, 8, iters=2, sample_mod=2)
            == similarity.kmeans_centroids(manual, 8, iters=2))
    # the sample is a strict, non-trivial subset
    n, ns = emb.count(), manual.count()
    assert 0 < ns < n


def test_semdedup_planted_pairs_and_cell_guard(spark):
    """SemDeDup finds planted scaled copies (same cell: scaling never
    moves the argmax-dot assignment) and the max_cell guard drops a
    degenerate cell without touching pairs elsewhere."""
    emb = tables.load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = similarity.kmeans_centroids(emb, 8, iters=1)
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    pairs = similarity.semdedup_pairs(corpus, cents, threshold=0.99)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 10_000) for i in range(5)} <= found
    # guard: excluding every cell kills all pairs; a huge cap changes nothing
    none = similarity.semdedup_pairs(corpus, cents, threshold=0.99, max_cell=0)
    assert none.count() == 0
    same = similarity.semdedup_pairs(
        corpus, cents, threshold=0.99, max_cell=10**9)
    assert {(r["id_a"], r["id_b"]) for r in same.collect()} == found


def test_hard_negatives_exclude_same_label(spark):
    """Every mined negative has a different label than its query, and
    it is the CLOSEST such vector (planted: an identical-direction
    same-label vector must be skipped in favor of a slightly-off
    different-label one)."""
    from twitter_to_sqlite_spark.functions import similarity

    rows = [
        (0, [1.0, 0.0], 0),    # query
        (1, [1.0, 0.001], 0),  # near-identical but SAME label
        (2, [0.9, 0.1], 1),    # best different-label
        (3, [0.0, 1.0], 1),
        (4, [0.5, 0.5], None),  # null label: excluded entirely
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = similarity.hard_negative_topk(
        e, e.filter("vec_id = 0"), k=2).collect()
    ids = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids == [2, 3]
    assert all(r["neighbor_id"] not in (1, 4) for r in got)


def test_vocab_coverage_hand_case(spark):
    from twitter_to_sqlite_spark.plans import catalog

    # replicate the catalog computation on a tiny corpus via the same
    # operator shape: 'a' x5, 'b' x3, 'c' x1, 'd' x1 -> top-2 covers 8/10
    from pyspark.sql import functions as F
    from twitter_to_sqlite_spark.functions import text as T

    d = spark.createDataFrame(
        [("a a a a a b b",), ("b c d",)], "text string")
    uni = (d.select(F.explode(T._tokens(F.col("text"))).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    top = uni.orderBy(F.col("c").desc(), "w").limit(2)
    covered = top.agg(F.sum("c")).collect()[0][0]
    total = uni.agg(F.sum("c")).collect()[0][0]
    assert (covered, total) == (8, 10)
    # and the registered catalog query returns one well-formed row
    r = catalog.QUERIES["vocab_coverage"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(r) == 1
    row = r[0]
    assert row["covered"] <= row["n_total"]
    assert abs(row["coverage"] + row["oov_rate"] - 1.0) < 1e-9
