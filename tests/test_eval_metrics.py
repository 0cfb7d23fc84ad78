"""Evaluation/monitoring metrics: ROC-AUC, calibration bins,
embedding profile, PMI collocations, novelty, PSI drift.

Each new r5 operator is pinned against a hand-computable planted
case, and AUC against a brute-force pairwise definition.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import dedup, stats, text


# ---------------------------------------------------------------- AUC

def _brute_auc(pairs):
    """P(s+ > s-) + 0.5 P(s+ = s-) over all (pos, neg) pairs."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_perfect_and_inverted_and_random(spark):
    rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, "y int, prob double")
    assert stats.roc_auc(df).collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame([(1 - y, s) for y, s in rows],
                                "y int, prob double")
    assert stats.roc_auc(inv).collect()[0]["auc"] == 0.0


def test_auc_all_ties_is_half(spark):
    df = spark.createDataFrame([(1, 0.5)] * 3 + [(0, 0.5)] * 5,
                               "y int, prob double")
    r = stats.roc_auc(df).collect()[0]
    assert r["auc"] == 0.5 and r["n_pos"] == 3 and r["n_neg"] == 5


def test_auc_matches_brute_force_with_ties(spark):
    # deterministic pseudo-random labels/scores with heavy ties
    pairs = [((i * 7) % 3 == 0 and 1 or 0, ((i * 13) % 5) / 4.0)
             for i in range(40)]
    df = spark.createDataFrame(pairs, "y int, prob double")
    got = stats.roc_auc(df).collect()[0]["auc"]
    assert got == pytest.approx(_brute_auc(pairs), abs=1e-6)


def test_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(1, 0.3), (1, 0.7)], "y int, prob double")
    assert stats.roc_auc(df).collect()[0]["auc"] is None


# -------------------------------------------------------- calibration

def test_calibration_bins_exact_counts_and_gap(spark):
    rows = ([(1, 0.95)] * 9 + [(0, 0.95)]          # bin 9: rate 0.9
            + [(1, 0.05)] * 2 + [(0, 0.05)] * 8)   # bin 0: rate 0.2
    df = spark.createDataFrame(rows, "y int, prob double")
    got = {r["bin"]: r for r in
           stats.calibration_bins(df, n_bins=10).collect()}
    assert set(got) == {0, 9}
    assert got[9]["n"] == 10 and got[9]["pos_rate"] == 0.9
    assert got[9]["avg_score"] == 0.95
    assert got[9]["gap"] == pytest.approx(0.05, abs=1e-6)
    assert got[0]["pos_rate"] == pytest.approx(0.2, abs=1e-6)
    assert got[0]["gap"] == pytest.approx(0.15, abs=1e-6)


def test_calibration_top_bin_includes_prob_one(spark):
    df = spark.createDataFrame([(1, 1.0), (0, 0.9999)], "y int, prob double")
    got = stats.calibration_bins(df, n_bins=10).collect()
    assert len(got) == 1 and got[0]["bin"] == 9 and got[0]["n"] == 2


# -------------------------------------------------- embedding profile

def test_embedding_profile_hand_case(spark):
    df = spark.createDataFrame(
        [([0.0, 1.0],), ([0.5, 1.0],), ([1.0, 1.0],)],
        "embedding array<float>")
    got = {r["pos"]: r for r in stats.embedding_profile(df).collect()}
    assert got[0]["n"] == 3 and got[0]["mean"] == 0.5
    # population variance of {0, .5, 1} = 1/6
    assert got[0]["var"] == pytest.approx(1 / 6, abs=1e-6)
    assert got[0]["min_val"] == 0.0 and got[0]["max_val"] == 1.0
    assert got[1]["var"] == 0.0 and got[1]["mean"] == 1.0


def test_embedding_profile_flags_collapsed_dimension(spark):
    # a "collapsed" dim 1 (all equal) has var 0; healthy dim 0 doesn't
    rows = [([float(i) / 10, 0.25],) for i in range(10)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    got = {r["pos"]: r for r in stats.embedding_profile(df).collect()}
    assert got[1]["var"] == 0.0
    assert got[0]["var"] > 0.01


# ------------------------------------------------------ collocations

def test_pmi_planted_collocation_ranks_first(spark):
    # "zig zag" always adjacent and exclusive; filler words mix freely
    docs = [("zig zag alpha beta gamma",)] * 5 + \
           [("alpha gamma beta alpha beta",)] * 5
    df = spark.createDataFrame(docs, "text string")
    got = text.pmi_collocations(df, min_count=3, top_k=5).collect()
    assert (got[0]["w1"], got[0]["w2"]) == ("zig", "zag")
    assert got[0]["n_pair"] == 5
    # exclusive pair beats promiscuous fillers
    assert got[0]["pmi"] > got[-1]["pmi"]


def test_pmi_min_count_floor(spark):
    df = spark.createDataFrame(
        [("rare pair",), ("common word common word common word",)],
        "text string")
    got = text.pmi_collocations(df, min_count=2, top_k=10).collect()
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in got)


# ----------------------------------------------------------- novelty

def test_novelty_copy_zero_and_fresh_one(spark):
    stored = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),  # copy
         (11, "completely unrelated fresh novel content here"),  # new
         (12, "the quick brown fox sat quietly eating lunch")],  # mixed
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.novelty_stats(new, stored, k=3).collect()}
    assert got[10]["novelty"] == 0.0
    assert got[11]["novelty"] == 1.0
    assert 0.0 < got[12]["novelty"] < 1.0
    # novel count never exceeds shingle count
    assert all(r["n_novel"] <= r["n_shingles"] for r in got.values())


def test_novelty_shingle_counts_are_distinct_counts(spark):
    stored = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    # "a b a b a b" has 4 distinct trigram shingles? tokens=6 ->
    # shingles: "a b a", "b a b", "a b a", "b a b" -> 2 distinct
    new = spark.createDataFrame([(2, "a b a b a b")],
                                "doc_id long, text string")
    r = dedup.novelty_stats(new, stored, k=3).collect()[0]
    assert r["n_shingles"] == 2 and r["novelty"] == 1.0


# --------------------------------------------------------- PSI drift

def _psi_of(spark, base_vals, cur_vals, bins=10):
    """Replay the catalog's PSI computation on two value lists."""
    b = spark.createDataFrame([(v,) for v in base_vals], "quality double")
    c = spark.createDataFrame([(v,) for v in cur_vals], "quality double")

    def counts(df, alias):
        col = F.least(F.floor(F.col("quality") * bins).cast("int"),
                      F.lit(bins - 1))
        return df.groupBy(col.alias("bin")).agg(
            F.count(F.lit(1)).alias(alias))

    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    g = (spine.join(counts(b, "nb"), "bin", "left")
         .join(counts(c, "nc"), "bin", "left")
         .fillna(0, ["nb", "nc"]).collect())
    tnb = sum(r["nb"] for r in g)
    tnc = sum(r["nc"] for r in g)
    psi = 0.0
    for r in sorted(g, key=lambda r: r["bin"]):
        pb = (r["nb"] + 1.0) / (tnb + bins)
        pc = (r["nc"] + 1.0) / (tnc + bins)
        psi += (pc - pb) * math.log(pc / pb)
    return psi


def test_psi_identical_distributions_is_zero(spark):
    vals = [i / 20 for i in range(20)]
    assert _psi_of(spark, vals, vals) == pytest.approx(0.0, abs=1e-12)


def test_psi_planted_shift_exceeds_alert_threshold(spark):
    base = [0.7 + (i % 3) / 10 for i in range(50)]   # mass in bins 7-9
    cur = [0.1 + (i % 3) / 10 for i in range(50)]    # mass in bins 1-3
    assert _psi_of(spark, base, cur) > 0.25          # "investigate"


def test_psi_catalog_query_flags_planted_drift(spark, sf_dir):
    from twitter_to_sqlite_spark.plans import catalog

    r = catalog.q_psi_drift(spark, sf_dir).collect()[0]
    assert r["n_cur"] > 0 and r["n_base"] > 0
    # planted spam docs shift the quality distribution measurably
    assert r["psi"] > 0.0


# ---------------------------------------------------------- WoE / IV

def test_woe_iv_separating_score_has_high_iv(spark, sf_dir):
    """The classifier's own training labels must be separable by its
    score (it fit them): high bins positive WoE, low bins negative,
    headline IV well above the 0.02 'useless' floor; smoothing keeps
    every term finite."""
    from twitter_to_sqlite_spark.plans import catalog

    rows = catalog.q_woe_iv(spark, sf_dir).collect()
    assert rows
    by_bin = sorted(rows, key=lambda r: r["bin"])
    iv = sum(r["iv_term"] for r in rows)
    assert iv > 0.02
    assert all(r["iv_term"] >= 0 for r in rows)  # (p-n)·ln(p/n) >= 0
    # monotone-ish separation: top bin more positive-heavy than bottom
    assert by_bin[-1]["woe"] > by_bin[0]["woe"]


# ------------------------------------------------- contingency stats

def test_contingency_stats_bounds_and_consistency(spark, sf_dir):
    """Cramér's V and MI live in their theoretical ranges, and χ²
    matches the standalone chi_square query on the same grid."""
    from twitter_to_sqlite_spark.plans import catalog

    r = catalog.q_contingency_stats(spark, sf_dir).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["mutual_info"] >= 0.0
    chi = catalog.QUERIES["chi_square"](spark, sf_dir).collect()[0]
    assert r["chi2"] == chi["chi2"]
    assert r["n_cells"] == chi["n_cells"]


def test_contingency_perfect_dependence_saturates(spark):
    """A perfectly dependent 2x2 table (a = f(t)) has V = 1 and
    MI = ln 2 (both variables uniform binary)."""
    import math

    from pyspark.sql import functions as F
    from twitter_to_sqlite_spark.plans import catalog  # noqa: F401

    # replay the operator shape on planted data via the same exprs
    rows = [("x", 0)] * 50 + [("y", 1)] * 50
    e = spark.createDataFrame(rows, "t string, a int")
    cells = e.groupBy("t", "a").agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("t").agg(F.sum("o").alias("rt"))
    ca = cells.groupBy("a").agg(F.sum("o").alias("ca"))
    n = cells.agg(F.sum("o").alias("n")).collect()[0]["n"]
    grid = (rt.crossJoin(ca).join(cells, ["t", "a"], "left")
            .withColumn("o", F.coalesce("o", F.lit(0))).collect())
    chi2 = sum((g["o"] - g["rt"] * g["ca"] / n) ** 2
               / (g["rt"] * g["ca"] / n) for g in grid)
    mi = sum((g["o"] / n) * math.log(g["o"] * n / (g["rt"] * g["ca"]))
             for g in grid if g["o"] > 0)
    v = math.sqrt(chi2 / (n * (2 - 1)))
    assert v == pytest.approx(1.0, abs=1e-12)
    assert mi == pytest.approx(math.log(2), abs=1e-12)


# ---------------------------------------------------------------------
# auc_bootstrap (r6): deterministic Poisson-bootstrap AUC band
# ---------------------------------------------------------------------

def _boot_rows(n=60):
    # noisy scorer with overlapping classes: positives get +0.15 on a
    # hash-spread base, so AUC is informative but far from 1 and the
    # bootstrap band is non-degenerate
    return [(i, 1 if i % 3 == 0 else 0,
             round((((i * 37) % 100) / 100.0
                    + (0.15 if i % 3 == 0 else 0.0)) % 1.0, 4))
            for i in range(n)]


def test_auc_bootstrap_perfect_separation_every_replica_one(spark):
    rows = [(i, 1, 0.9) for i in range(20)] + \
           [(100 + i, 0, 0.1) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, y int, prob double")
    got = stats.auc_bootstrap(df, n_resamples=6).collect()
    assert len(got) == 6
    for r in got:
        # a replica could in principle draw weight 0 for a whole class
        # (prob ~ e^-20); with these sizes every replica must be 1.0
        assert r["auc"] == 1.0, r


def test_auc_bootstrap_is_deterministic_and_partition_invariant(spark):
    rows = _boot_rows()
    df1 = spark.createDataFrame(
        rows, "doc_id long, y int, prob double").repartition(1)
    df7 = spark.createDataFrame(
        rows, "doc_id long, y int, prob double").repartition(7)
    a = {r["b"]: (r["w_pos"], r["w_neg"], r["auc"])
         for r in stats.auc_bootstrap(df1).collect()}
    b = {r["b"]: (r["w_pos"], r["w_neg"], r["auc"])
         for r in stats.auc_bootstrap(df7).collect()}
    assert a == b and len(a) == 8
    # band is non-degenerate: replicas genuinely differ
    assert len({v[2] for v in a.values()}) > 1


def test_auc_bootstrap_unit_weights_reduce_to_roc_auc(spark):
    """With the Poisson draw forced to 1, every replica must equal the
    exact tie-aware roc_auc of the unresampled data — pins the
    weighted Mann-Whitney algebra to the certified unweighted form."""
    import twitter_to_sqlite_spark.functions.stats as S

    rows = _boot_rows()
    df = spark.createDataFrame(rows, "doc_id long, y int, prob double")
    want = S.roc_auc(df, "y", "prob").collect()[0]["auc"]
    orig = S._poisson1_weight
    S._poisson1_weight = lambda u: F.lit(1).cast("long")
    try:
        got = S.auc_bootstrap(df, n_resamples=3).collect()
    finally:
        S._poisson1_weight = orig
    assert all(r["auc"] == want for r in got)


def test_grouped_auc_matches_global_per_group(spark):
    """Per-group AUC must equal roc_auc run on each group alone."""
    rows = [(i, "a" if i % 2 == 0 else "b",
             1 if i % 3 == 0 else 0,
             round(((i * 31) % 100) / 100.0
                   + (0.2 if i % 3 == 0 else 0.0), 4))
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, g string, y int, prob double")
    got = {r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
           for r in stats.grouped_roc_auc(df, "g").collect()}
    for gname in ("a", "b"):
        sub = df.filter(F.col("g") == gname)
        want = stats.roc_auc(sub).collect()[0]
        assert got[gname] == (want["n_pos"], want["n_neg"], want["auc"])


def test_grouped_auc_single_class_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 0.9), (2, "a", 0, 0.1),
         (3, "b", 1, 0.9), (4, "b", 1, 0.8)],
        "doc_id long, g string, y int, prob double")
    got = {r["g"]: r["auc"]
           for r in stats.grouped_roc_auc(df, "g").collect()}
    assert got["a"] == 1.0 and got["b"] is None


# ------------------------------------------------------------ KS drift

def test_ks_identical_distributions_is_zero_and_shift_is_large(spark):
    """Pin the KS construction on hand values: identical samples give
    D = 0; disjoint supports give D = 1; a half-shift gives D = 0.5."""
    from pyspark.sql import Window

    def ks(a_vals, b_vals):
        a = spark.createDataFrame(
            [(v, 1, 0) for v in a_vals], "quality double, b int, c int")
        b = spark.createDataFrame(
            [(v, 0, 1) for v in b_vals], "quality double, b int, c int")
        g = a.unionByName(b).groupBy("quality").agg(
            F.sum("b").alias("nb"), F.sum("c").alias("nc"))
        w = Window.orderBy("quality").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        c = g.select(F.sum("nb").over(w).alias("cb"),
                     F.sum("nc").over(w).alias("cc"))
        tb, tc = len(a_vals), len(b_vals)
        rows = c.collect()
        return max(abs(r["cb"] / tb - r["cc"] / tc) for r in rows)

    assert ks([0.1, 0.2, 0.3], [0.1, 0.2, 0.3]) == 0.0
    assert ks([0.1, 0.2], [0.8, 0.9]) == 1.0
    assert ks([0.1, 0.2, 0.3, 0.4], [0.3, 0.4, 0.5, 0.6]) == 0.5


def test_ks_drift_catalog_detects_planted_spam(spark, sf_dir):
    from twitter_to_sqlite_spark.plans import catalog

    r = catalog.q_ks_drift(spark, sf_dir).collect()[0]
    assert r["n_base"] > 0 and r["n_cur"] > r["n_base"] // 2
    assert r["ks"] > 0.05          # the planted spam shard must show
    assert r["ks"] <= 1.0
