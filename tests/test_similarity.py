

def test_knn_graph_blocked_neighbors(spark):
    """Two well-separated clusters: neighbors never cross cells; each
    node ranks its own cell-mates by cosine with id tie-break; rank
    list is 1..min(k, cell_size-1)."""
    from twitter_to_sqlite_spark.functions import similarity as S

    # cluster A near +x, cluster B near +y
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.8, 0.05]),
            (11, [0.0, 1.0]), (12, [0.1, 0.9])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = S.knn_graph(e, cents, k=2).collect()
    a_ids, b_ids = {1, 2, 3}, {11, 12}
    for r in got:
        same = (r["src"] in a_ids) == (r["nbr"] in a_ids)
        assert same, f"cross-cell edge {r}"
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    assert sorted(r["rank"] for r in by_src[1]) == [1, 2]
    assert sorted(r["rank"] for r in by_src[11]) == [1]
    # node 1's nearest cell-mate by cosine is 3 ([0.8,0.05] is more
    # x-aligned than [0.9,0.1])
    assert [r["nbr"] for r in sorted(by_src[1], key=lambda r: r["rank"])] \
        == [3, 2]


def test_injected_cell_pairs_match_self_computed(spark):
    """The r11 shared cell_scored_pairs frame must reproduce every
    consumer's self-computed rows exactly: the semdedup threshold is
    a pure post-filter, knn_graph is a pure rank tail, and the
    right= decomposition (base pairs ∪ pairs-involving-planted, when
    every planted id exceeds every base id) is row-exact."""
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark.functions import similarity as S

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.8, 0.05]),
            (11, [0.0, 1.0]), (12, [0.1, 0.9])]
    base = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    planted = base.filter(F.col("vec_id") <= 2).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"))
    union = base.unionByName(planted)

    def same(a, b, name):
        assert a.exceptAll(b).count() == 0, name
        assert b.exceptAll(a).count() == 0, name

    base_pairs = S.cell_scored_pairs(base, cents)
    # decomposition law: pairs(base ∪ planted) splits exactly
    composed = base_pairs.unionByName(
        S.cell_scored_pairs(union, cents, right=planted))
    same(composed, S.cell_scored_pairs(union, cents), "decomposition")
    # semdedup: injected shared frame ≡ self-computed
    same(S.semdedup_pairs(None, cents, threshold=0.9, pairs=composed),
         S.semdedup_pairs(union, cents, threshold=0.9), "semdedup")
    # knn_graph: injected shared frame ≡ self-computed
    same(S.knn_graph(base, cents, k=2, pairs=base_pairs),
         S.knn_graph(base, cents, k=2), "knn_graph")


def test_mmr_diversify_prefers_diverse_over_redundant(spark):
    """Planted geometry: candidates A(rel .99) and A'(rel .98) are
    near-copies; B(rel .90) is orthogonal-ish to A. Pure relevance
    would pick (A, A', B); MMR must pick A first, then B (A' pays a
    big redundancy penalty), then A'."""
    from twitter_to_sqlite_spark.functions import similarity as S

    rows = [
        (1, 0.99, [1.0, 0.0, 0.0]),
        (2, 0.98, [0.999, 0.01, 0.0]),
        (3, 0.90, [0.0, 1.0, 0.0]),
    ]
    cands = spark.createDataFrame(
        rows, "id long, rel double, v array<double>")
    got = sorted(S.mmr_diversify(cands, k=3, lam=0.75).collect(),
                 key=lambda r: r["rank"])
    assert [r["id"] for r in got] == [1, 3, 2]
    assert got[0]["mmr_score"] == 0.99
    # step-2 scores: B: .75*.90 - .25*0 = .675 ; A': .75*.98 - .25*~1
    assert got[1]["mmr_score"] == round(0.75 * 0.90 - 0.25 * 0.0, 4)


def test_knn_classify_eval_majority_vote(spark):
    """Hand-built graph: node 1's neighbors vote 2:1 for label A;
    node 2's split 1:1 ties toward the smaller label; accuracies per
    class follow exactly."""
    from twitter_to_sqlite_spark.functions import similarity as S

    graph = spark.createDataFrame(
        [(1, 2, 1, 0.9), (1, 3, 2, 0.8), (1, 4, 3, 0.7),
         (2, 1, 1, 0.9), (2, 4, 2, 0.8)],
        "src long, nbr long, rank long, cosine double")
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)],
        "vec_id long, label int")
    got = {r["label"]: r for r in
           S.knn_classify_eval(graph, labels).collect()}
    # node1: nbr labels {10,10,20} -> pred 10 == own 10 (correct)
    # node2: nbr labels {10,20} tie -> pred 10 == own 10 (correct)
    assert got[10]["n"] == 2 and got[10]["n_correct"] == 2
    assert got[10]["accuracy"] == 1.0


def test_centroid_label_noise_flags_planted_flips(spark):
    from twitter_to_sqlite_spark.functions.similarity import (
        centroid_label_noise,
    )

    # Two tight, well-separated clusters; three class-1 points carry
    # label 0 (planted noise) and must be the ONLY flags.
    rows = []
    for i in range(20):
        rows.append((i, [1.0 + 0.001 * i, 0.0], 0))
    for i in range(20, 40):
        rows.append((i, [0.0, 1.0 + 0.001 * i], 1))
    for i in range(40, 43):  # cluster-1 geometry, label 0
        rows.append((i, [0.0, 1.0], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in
           centroid_label_noise(df, margin=0.02).collect()}
    assert out[0]["n"] == 23 and out[0]["n_flagged"] == 3
    assert out[1]["n"] == 20 and out[1]["n_flagged"] == 0
    assert out[0]["noise_rate"] == round(3 / 23, 6)


def test_label_noise_single_label_publishes_zero_not_null(spark):
    """Degenerate corpus (one distinct label): best_other is
    array_max([]) = NULL, so the flag must coalesce to 0 — Spark's
    sum over all-NULL is NULL while the SQL twin's CASE...ELSE 0 is 0
    (the r7 ADVICE divergence, pinned)."""
    from twitter_to_sqlite_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, 0, [1.0, 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, label int, embedding array<double>")
    rows = similarity.centroid_label_noise(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_flagged"] == 0          # not None
    assert rows[0]["noise_rate"] == 0.0
